from .dictionary import RingDict
from .matchers import MatchTable, HashTableMatcher, BinaryTreeMatcher, RabinKarpMatcher

__all__ = [
    "RingDict",
    "MatchTable",
    "HashTableMatcher",
    "BinaryTreeMatcher",
    "RabinKarpMatcher",
]
