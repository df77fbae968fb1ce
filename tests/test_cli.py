"""CLI surface tests (mirrors the reference CLI, NLZM.cpp:2165-2171).

Covers the flag grammar (flags accepted before OR after the command),
the c/d/t/h commands, refuse-overwrite, and the block-container profiles
through the serial engine (the TPU path is covered by test_tpu_decode).
"""

import numpy as np
import pytest

from nlzm_tpu.cli import main
from nlzm_tpu.utils.crc32 import crc32


@pytest.fixture
def sample(tmp_path, corpus_text):
    data = corpus_text(50000)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    return data, src, tmp_path


def _roundtrip(src, dst, out, flags):
    assert main(flags + ["c", str(src), str(dst)]) == 0
    assert main(["-engine:serial", "d", str(dst), str(out)]) == 0
    return out.read_bytes()


def test_cli_single_stream(sample):
    data, src, d = sample
    assert _roundtrip(src, d / "a.nlzm", d / "a.out", ["-window:18"]) == data


def test_cli_flags_after_command(sample):
    """Flags are position-independent (the reference puts them first;
    users put them anywhere)."""
    data, src, d = sample
    dst, out = d / "b.nlzp", d / "b.out"
    assert main(["c", str(src), str(dst), "-profile:wide", "-blocks"]) == 0
    assert dst.read_bytes()[:4] == b"NLZP"
    assert main(["d", str(dst), str(out), "-engine:serial"]) == 0
    assert out.read_bytes() == data


def test_cli_blocks_v1_profile(sample):
    data, src, d = sample
    got = _roundtrip(src, d / "c.nlzp", d / "c.out", ["-blocks:32768"])
    assert got == data


def test_cli_refuse_overwrite(sample):
    _, src, d = sample
    dst = d / "d.nlzm"
    dst.write_bytes(b"existing")
    assert main(["c", str(src), str(dst)]) == 1
    assert dst.read_bytes() == b"existing"


def test_cli_crc_and_test_mode(sample, capsys):
    data, src, d = sample
    assert main(["h", str(src)]) == 0
    assert f"{crc32(data):X}" in capsys.readouterr().out
    dst = d / "e.nlzm"
    assert main(["c", str(src), str(dst)]) == 0
    capsys.readouterr()
    assert main(["-engine:serial", "t", str(dst)]) == 0
    assert f"{crc32(data):X}" in capsys.readouterr().out


def test_cli_bad_flag_and_usage(sample):
    _, src, _ = sample
    assert main(["-bogus:1", "c", str(src), "x"]) == 1
    assert main([]) == 1
    assert main(["c", str(src)]) == 1  # missing output operand
