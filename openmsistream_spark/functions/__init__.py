from .hashes import sha512_digest, sha512_hex, portable_hash64
from .keys import msg_key, parse_msg_key

__all__ = [
    "sha512_digest",
    "sha512_hex",
    "portable_hash64",
    "msg_key",
    "parse_msg_key",
]
