"""P9 — encryption/decryption stages for the compound serde chain.

The reference wraps key+value serde with KafkaCrypto
(kafka_wrapper/openmsistream_kafka_crypto.py:1-123) and gives decryption
a bounded wait, after which a message either raises or — with
``treat_undecryptable_as_plaintext`` — passes through unchanged
(serialization.py:84-160; consts utilities/config.py:41-42).

KafkaCrypto is an external key-management service; the cipher itself is
pluggable: call ``set_cipher(encrypt_fn, decrypt_fn)`` with any
implementation and the Spark-side plumbing — Arrow-batched UDF stages,
chain composition, undecryptable→DLQ routing — is what this module
provides and tests. A real symmetric cipher backed by ``cryptography``'s
Fernet recipe (AES-128-CBC + HMAC-SHA256) ships here as
``fernet_cipher``/``set_fernet_cipher``; KafkaCrypto's key-exchange
topics remain out of scope (external service). Without a registered
cipher, ``strict`` mode raises NotImplementedError; non-strict mode is
the identity (plaintext) chain.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import lru_cache, partial

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CipherFn = Callable[[bytes], bytes]

_ENCRYPT: CipherFn | None = None
_DECRYPT: CipherFn | None = None


def set_cipher(encrypt: CipherFn, decrypt: CipherFn) -> None:
    """Register the real cipher pair (KafkaCrypto-backed in production)."""
    global _ENCRYPT, _DECRYPT
    _ENCRYPT, _DECRYPT = encrypt, decrypt


def clear_cipher() -> None:
    global _ENCRYPT, _DECRYPT
    _ENCRYPT = _DECRYPT = None


@lru_cache(maxsize=8)
def _fernet(key: bytes):
    from cryptography.fernet import Fernet

    return Fernet(key)


# module-level so the partials pickle into executor-side UDF closures;
# the Fernet instance is built once per worker (lru_cache), not per row
def _fernet_encrypt(key: bytes, data: bytes) -> bytes:
    return _fernet(key).encrypt(data)


def _fernet_decrypt(key: bytes, data: bytes) -> bytes:
    return _fernet(key).decrypt(data)


def fernet_cipher(key: bytes | str) -> tuple[CipherFn, CipherFn]:
    """P9 — a real symmetric cipher pair for the serde chain, backed by
    ``cryptography``'s Fernet recipe (AES-128-CBC + HMAC-SHA256).

    Plays the role of the reference's per-message symmetric encryption
    (kafka_wrapper/openmsistream_kafka_crypto.py:1-123 wires KafkaCrypto
    serializers around key+value; serialization.py:84-160 bounds the
    decrypt wait). Key distribution/rotation is KafkaCrypto's
    key-passing-topic protocol — an external service by design; here the
    key is provisioned by the caller. Decrypting garbage or a
    wrong-key ciphertext raises InvalidToken, which the decrypt stage
    turns into a ``decrypt_error`` row (→ K6 DLQ split) or a plaintext
    passthrough under ``treat_undecryptable_as_plaintext``.
    """
    key_b = key.encode() if isinstance(key, str) else bytes(key)
    _fernet(key_b)  # validate the key eagerly, on the driver
    return partial(_fernet_encrypt, key_b), partial(_fernet_decrypt, key_b)


def set_fernet_cipher(key: bytes | str | None = None) -> bytes:
    """Generate (or take) a Fernet key, register the cipher pair, and
    return the key so the consumer side can register the same one."""
    if key is None:
        from cryptography.fernet import Fernet

        key = Fernet.generate_key()
    key_b = key.encode() if isinstance(key, str) else bytes(key)
    set_cipher(*fernet_cipher(key_b))
    return key_b


def _require(fn: CipherFn | None, strict: bool) -> CipherFn | None:
    if fn is None and strict:
        raise NotImplementedError(
            "no cipher registered: call set_cipher() with a real "
            "encrypt/decrypt pair (KafkaCrypto etc.); the container image "
            "ships no crypto libraries (stub by design)"
        )
    return fn


def encrypt_column(col: Column | str, strict: bool = False) -> Column:
    """Serde-chain encrypt stage: BINARY → BINARY. Identity when no
    cipher is registered (plaintext chain)."""
    fn = _require(_ENCRYPT, strict)
    if fn is None:
        return F.col(col) if isinstance(col, str) else col

    @F.pandas_udf(T.BinaryType())
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda b: fn(bytes(b)) if b is not None else None)

    return _enc(col)


DECRYPT_SCHEMA = T.StructType(
    [
        T.StructField("plaintext", T.BinaryType()),
        T.StructField("decrypt_error", T.StringType()),
    ]
)


def decrypt_column(
    col: Column | str,
    strict: bool = False,
    treat_undecryptable_as_plaintext: bool = False,
) -> Column:
    """Serde-chain decrypt stage: BINARY → STRUCT(plaintext, decrypt_error).

    A failing decrypt never raises mid-task — it yields a row with
    ``decrypt_error`` set (→ K6 dead-letter split), or, with
    ``treat_undecryptable_as_plaintext``, passes the ciphertext through
    as plaintext (the reference's fallback, serialization.py:143-160).
    The reference's bounded *wait* for late keys is a poll-loop concern;
    under Spark the retry unit is the micro-batch (undecryptable rows
    re-enter via the DLQ re-key tool, K8).
    """
    fn = _require(_DECRYPT, strict)
    if fn is None:
        src = F.col(col) if isinstance(col, str) else col
        return F.struct(
            src.alias("plaintext"), F.lit(None).cast("string").alias("decrypt_error")
        )

    fallthrough = treat_undecryptable_as_plaintext

    @F.pandas_udf(DECRYPT_SCHEMA)
    def _dec(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            if b is None:
                rows.append({"plaintext": None, "decrypt_error": None})
                continue
            try:
                rows.append({"plaintext": fn(bytes(b)), "decrypt_error": None})
            except Exception as exc:
                if fallthrough:
                    rows.append({"plaintext": bytes(b), "decrypt_error": None})
                else:
                    rows.append({"plaintext": None, "decrypt_error": str(exc)[:200]})
        return pd.DataFrame(rows)

    return _dec(col)


def encrypt_messages(messages: DataFrame, value_col: str = "value") -> DataFrame:
    """Apply the encrypt stage to a (key, value) message DataFrame."""
    return messages.withColumn(value_col, encrypt_column(value_col))


def decrypt_messages(
    messages: DataFrame,
    value_col: str = "value",
    treat_undecryptable_as_plaintext: bool = False,
) -> DataFrame:
    """Apply the decrypt stage; adds ``decrypt_error`` and replaces the
    value with the plaintext (null when undecryptable → DLQ split)."""
    dec = decrypt_column(
        value_col, treat_undecryptable_as_plaintext=treat_undecryptable_as_plaintext
    )
    return (
        messages.withColumn("_dec", dec)
        .withColumn(value_col, F.col("_dec.plaintext"))
        .withColumn("decrypt_error", F.col("_dec.decrypt_error"))
        .drop("_dec")
    )
