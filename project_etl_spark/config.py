"""Typed configuration at the edge (SURVEY.md §1.2, §7.2).

The reference validates TOML run configs through Pydantic models before
anything runs ("type-safe configuration validation",
DAQ_self-triggering.md:18, :471), with nested structure: run_config /
telescope_config / service_hybrids[] / modules[] and per-ETROC maps like
``offset = {0 = 30, 1 = 30}`` (:395-416).

Spark analog: parse TOML with stdlib ``tomllib``, validate against an
explicit ``StructType`` (names, types, required fields — fail fast, never
infer), then expose the module table as a small DataFrame that joins
broadcast-style onto fact data (the config-as-dimension pattern).
"""

from __future__ import annotations

import io
import tomllib
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONFIG_SCHEMA = T.StructType([
    T.StructField("run_config", T.StructType([
        T.StructField("num_runs", T.IntegerType(), False),
        T.StructField("beam_energy", T.IntegerType(), False),
    ]), False),
    T.StructField("telescope_config", T.StructType([
        T.StructField("l1a_delay", T.IntegerType(), False),
        T.StructField("service_hybrids", T.ArrayType(T.StructType([
            T.StructField("rb", T.IntegerType(), False),
            T.StructField("self_triggering", T.BooleanType(), False),
            T.StructField("modules", T.ArrayType(T.StructType([
                T.StructField("name", T.StringType(), False),
                T.StructField("id", T.IntegerType(), False),
                T.StructField("slot", T.IntegerType(), False),
                T.StructField("offset", T.MapType(T.IntegerType(), T.IntegerType()), False),
                T.StructField("power_mode", T.MapType(T.IntegerType(), T.StringType()), True),
            ])), False),
        ])), False),
    ]), False),
])

_POWER_MODES = {"low", "medium", "high"}


class ConfigError(ValueError):
    pass


def _bad_map(ctx: str):
    raise ConfigError(f"{ctx}.power_mode: expected a map of etroc -> mode")


def _req(d: dict, key: str, typ: type, ctx: str) -> Any:
    if key not in d:
        raise ConfigError(f"{ctx}: missing required key {key!r}")
    v = d[key]
    if typ is int and isinstance(v, bool):
        raise ConfigError(f"{ctx}.{key}: expected int, got bool")
    if not isinstance(v, typ):
        raise ConfigError(f"{ctx}.{key}: expected {typ.__name__}, got {type(v).__name__}")
    return v


def _int_keyed_map(d: dict, ctx: str, val_type: type) -> dict[int, Any]:
    out = {}
    for k, v in d.items():
        try:
            ik = int(k)
        except (TypeError, ValueError):
            raise ConfigError(f"{ctx}: map key {k!r} is not an ETROC index")
        if not isinstance(v, val_type):
            raise ConfigError(f"{ctx}[{k}]: expected {val_type.__name__}")
        out[ik] = v
    return out


def parse_config(toml_text: str) -> dict:
    """TOML -> validated plain dict shaped like CONFIG_SCHEMA. Raises
    ConfigError with a path-qualified message on any violation."""
    try:
        raw = tomllib.load(io.BytesIO(toml_text.encode()))
    except tomllib.TOMLDecodeError as ex:
        raise ConfigError(f"config is not valid TOML: {ex}") from ex
    rc = _req(raw, "run_config", dict, "config")
    tc = _req(raw, "telescope_config", dict, "config")
    out = {
        "run_config": {
            "num_runs": _req(rc, "num_runs", int, "run_config"),
            "beam_energy": _req(rc, "beam_energy", int, "run_config"),
        },
        "telescope_config": {
            "l1a_delay": _req(tc, "l1a_delay", int, "telescope_config"),
            "service_hybrids": [],
        },
    }
    if out["run_config"]["num_runs"] <= 0:
        raise ConfigError("run_config.num_runs: must be positive")
    for i, sh in enumerate(_req(tc, "service_hybrids", list, "telescope_config")):
        ctx = f"service_hybrids[{i}]"
        if not isinstance(sh, dict):
            raise ConfigError(f"{ctx}: expected a table, got {type(sh).__name__}")
        hy = {
            "rb": _req(sh, "rb", int, ctx),
            "self_triggering": _req(sh, "self_triggering", bool, ctx),
            "modules": [],
        }
        for j, m in enumerate(_req(sh, "modules", list, ctx)):
            mctx = f"{ctx}.modules[{j}]"
            if not isinstance(m, dict):
                raise ConfigError(f"{mctx}: expected a table, got {type(m).__name__}")
            mod = {
                "name": _req(m, "name", str, mctx),
                "id": _req(m, "id", int, mctx),
                "slot": _req(m, "slot", int, mctx),
                "offset": _int_keyed_map(_req(m, "offset", dict, mctx), mctx + ".offset", int),
                "power_mode": _int_keyed_map(
                    m.get("power_mode", {}) if isinstance(m.get("power_mode", {}), dict)
                    else _bad_map(mctx), mctx + ".power_mode", str),
            }
            for pm in mod["power_mode"].values():
                if pm not in _POWER_MODES:
                    raise ConfigError(f"{mctx}.power_mode: {pm!r} not in {sorted(_POWER_MODES)}")
            hy["modules"].append(mod)
        out["telescope_config"]["service_hybrids"].append(hy)
    return out


def config_df(spark: SparkSession, toml_text: str) -> DataFrame:
    """One-row DataFrame with the full nested config (schema-enforced).

    One-slice parallelize: the default createDataFrame path would slice
    this single row over every core — one python-worker task per core for
    a one-row frame (see operators.streaming_live._write_fixture)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize([parse_config(toml_text)], 1),
        CONFIG_SCHEMA)


def module_dimension(spark: SparkSession, toml_text: str) -> DataFrame:
    """Flatten config to a per-(rb, module, etroc) dimension table — the
    broadcast side for enriching hit/threshold facts with offsets."""
    cfg = config_df(spark, toml_text)
    return (
        cfg.select(F.explode("telescope_config.service_hybrids").alias("sh"))
        .select(F.col("sh.rb").alias("rb"),
                F.col("sh.self_triggering").alias("self_triggering"),
                F.explode("sh.modules").alias("m"))
        .select("rb", "self_triggering",
                F.col("m.name").alias("module_name"),
                F.col("m.id").alias("module_id"),
                F.col("m.slot").alias("slot"),
                F.explode("m.offset").alias("etroc", "offset"))
    )
