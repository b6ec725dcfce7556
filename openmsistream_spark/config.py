"""Reference-format config files → Spark Kafka options.

The reference drives every program from an INI config file with
``[broker]`` / ``[producer]`` / ``[consumer]`` sections whose values may
be ``$ENV_VAR`` references (utilities/config_file_parser.py:30-80;
example files under kafka_wrapper/config_files/). A reference user's
muscle memory is ``--config prod.config --topic_name t`` — this module
lets those same files configure the Spark engine:

  - ``parse_config`` reads the INI and resolves ``$ENV_VAR`` values;
  - ``kafka_options`` maps broker+role sections onto the Spark Kafka
    connector's option namespace (every librdkafka key prefixed
    ``kafka.``, per Spark's convention);
  - ``topic_uri`` builds this package's ``kafka://hosts/topic`` URI
    from the config's bootstrap servers.

The reference's serializer/deserializer keys are intentionally dropped:
wire serde is an explicit, tested operator here (functions/serde.py),
not a client-config knob. Offset/commit management keys are dropped too
— Spark's source manages offsets through its checkpoint, not the
consumer group (enable.auto.commit etc. would be misleading no-ops).
"""

from __future__ import annotations

import configparser
import os

# reference-client knobs that do NOT translate to the Spark connector:
# serde is the engine's wire layer; offsets/commits belong to the
# streaming checkpoint, not the kafka client.
_DROPPED_KEYS = {
    "key.serializer",
    "value.serializer",
    "key.deserializer",
    "value.deserializer",
    "enable.auto.commit",
    "auto.offset.reset",  # expressed as startingOffsets on the source
}


def parse_config(path: str) -> dict[str, dict[str, str]]:
    """Read a reference-format INI config; values starting with ``$``
    resolve from the environment (raising a clear error when the
    variable is unset, mirroring the reference's fail-on-missing)."""
    if not os.path.isfile(path):
        raise FileNotFoundError(f"config file {path} does not exist")
    cp = configparser.ConfigParser()
    cp.read(path)
    out: dict[str, dict[str, str]] = {}
    for section in cp.sections():
        resolved = {}
        for key, val in cp[section].items():
            if val.startswith("$"):
                env = val[1:]
                if env not in os.environ:
                    raise KeyError(
                        f"config {path} [{section}] {key} references "
                        f"${env}, which is not set in the environment"
                    )
                val = os.environ[env]
            resolved[key] = val
        out[section] = resolved
    return out


def kafka_options(
    cfg: dict[str, dict[str, str]], role: str = "consumer"
) -> dict[str, str]:
    """Spark Kafka connector options from a parsed config: the
    ``[broker]`` section merged with ``[producer]`` or ``[consumer]``,
    each surviving key prefixed ``kafka.`` (Spark passes them to the
    underlying client verbatim). ``auto.offset.reset = earliest`` is
    honored by the CALLER as ``startingOffsets`` — see
    ``starting_offsets``."""
    if role not in ("producer", "consumer"):
        raise ValueError(f"role must be producer or consumer, got {role!r}")
    merged = {**cfg.get("broker", {}), **cfg.get(role, {})}
    return {
        f"kafka.{k}": v
        for k, v in merged.items()
        if k not in _DROPPED_KEYS and k != "bootstrap.servers"
    }


def starting_offsets(cfg: dict[str, dict[str, str]]) -> str:
    """The Spark ``startingOffsets`` value implied by the config's
    ``[consumer] auto.offset.reset`` (the reference's
    restart-at-beginning switch, consumer_group.py:107-139)."""
    return (
        "earliest"
        if cfg.get("consumer", {}).get("auto.offset.reset", "") == "earliest"
        else "latest"
    )


def topic_uri(cfg: dict[str, dict[str, str]], topic: str) -> str:
    """``kafka://hosts/topic`` from the config's bootstrap servers."""
    hosts = cfg.get("broker", {}).get("bootstrap.servers")
    if not hosts:
        raise KeyError("config has no [broker] bootstrap.servers")
    return f"kafka://{hosts}/{topic}"
