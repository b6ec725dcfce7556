"""Shared parameter sidecar for durable sketch/mask ledgers.

A ledger's rows are only meaningful under the parameters that wrote
them: HLL registers under their ``p`` (a different p is a different
bucket space — max-merging across them silently estimates nonsense),
CMS cells under their ``(d, w)`` (a different geometry aliases
counters), bloom positions under their ``(n, m_bits, k)``. Every
ledger-backed streaming sink therefore persists its parameters in a
one-row parquet sidecar at ``<ledger path>_params`` on first start and
VALIDATES them on every restart — a mismatch is refused by name before
any batch runs, and a pre-sidecar ledger is refused as unverifiable
rather than guessed at.

The sidecar rides the same Hadoop-visible storage as the ledger (one
tiny parquet write — atomic enough for a value written once and only
ever compared).
"""

from __future__ import annotations


def ensure_sidecar_params(registry, params: dict[str, int], sink_name: str) -> None:
    """Write-once / validate-always parameter guard for a registry-backed
    ledger. ``params`` is an ordered mapping of parameter name to int;
    raises ``ValueError`` on restart mismatch or on a legacy ledger with
    no sidecar."""
    spark = registry.spark
    params_path = registry.path.rstrip("/") + "_params"
    names = list(params)
    if registry.fs.exists(params_path):
        row = spark.read.parquet(params_path).first()
        have = tuple(row[n] for n in names)
        want = tuple(int(params[n]) for n in names)
        if have != want:
            raise ValueError(
                f"{sink_name}: ledger at {registry.path} was built with "
                f"({', '.join(names)})={have}, restart requested {want} — "
                "reuse the recorded parameters or start a fresh ledger"
            )
        return
    if registry.exists():
        raise ValueError(
            f"{sink_name}: ledger at {registry.path} predates parameter "
            "tracking and carries no _params sidecar — cannot verify "
            f"({', '.join(names)}) match; write the sidecar manually if "
            "the parameters are known to be right"
        )
    schema = ", ".join(f"{n} long" for n in names)
    spark.createDataFrame(
        [tuple(int(params[n]) for n in names)], schema
    ).write.mode("overwrite").parquet(params_path)
