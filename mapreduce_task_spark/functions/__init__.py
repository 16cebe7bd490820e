from .text import NON_LETTER_RE, TOKEN_SPLIT_RE, normalize_token, tokenize, words
from .hashing import hash64, md5_hex, minhash_seed_hash
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "NON_LETTER_RE",
    "TOKEN_SPLIT_RE",
    "normalize_token",
    "tokenize",
    "words",
    "hash64",
    "md5_hex",
    "minhash_seed_hash",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
