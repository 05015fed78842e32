"""Round-9 regression tests for the round-8 ADVICE items.

1. **Bradley-Terry headroom** — the MM denominator terms n_ij/(p_i+p_j)
   are corpus-scaled (n_ij counts matches), so they quantize at MICRO,
   not nano; the guard extrapolates to the 100 TB design point and also
   proves the pre-fix nano quantum would have wrapped (sharp, not
   vacuous — the test_round8_headroom.py discipline).

2. **Event-time gap split** — `_session_fn` must close a session from
   the DATA branch when an event lands more than the gap after the open
   session's last event, so session boundaries are a pure function of
   event times, never of micro-batch layout or watermark lag.

3. **Resample ESS Σwt² via DECIMAL** — long-doc corpora wrap a raw int64
   Σwt²; the decimal path must stay exact where int64 would wrap.

4. **Sweep NaN sentinel** — tools/oracle_sweep.py's default normalizer
   must distinguish Spark-NaN from NULL (the divide-by-zero divergence
   class the WHERE guards exist for).
"""

from __future__ import annotations

import duckdb
import pandas as pd

INT64_MAX = 2**63 - 1
N_DOCS_100TB = int(5e10)      # 100 TB / ~2 KB per document


# ---------------------------------------------------------------------------
# 1. Bradley-Terry MM-denominator headroom
# ---------------------------------------------------------------------------

def test_bradley_terry_denominator_survives_100tb(spark, sf_dir):
    """Each d2 term is n_ij/(p_i+p_j) with ratings sum-normalized to k,
    so at 100 TB over few sources a single (i,j) cell can hold ~5e10
    matches against a pair-rating sum of O(1). Micro must clear int64
    with >= 2x margin; the pre-fix nano quantum must provably wrap."""
    from project_etl_spark.operators.llm_curation import (
        ext_bradley_terry_step)

    out = ext_bradley_terry_step(spark, sf_dir).collect()
    assert out, "fixture produced no sources"
    # final normalized ratings bound the p_i+p_j denominators from below
    min_pair = max(2 * min(r["rating_micro"] for r in out) / 1e6, 1e-2)
    worst_term = N_DOCS_100TB / min_pair
    assert worst_term * 1e6 * 2 < INT64_MAX, (
        f"micro den term would wrap at 100 TB (min p_i+p_j={min_pair:.3f})")
    assert worst_term * 1e9 > INT64_MAX, (
        "nano terms would NOT wrap — guard gone vacuous; tighten the bound")


# ---------------------------------------------------------------------------
# 2. data-branch gap split in the EventTimeTimeout sessionizer
# ---------------------------------------------------------------------------

class _FakeState:
    """Minimal GroupState stand-in: drives _session_fn's data branch."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _run_session_fn(events_us, state):
    from project_etl_spark.streaming.stateful import _session_fn

    pdf = pd.DataFrame(
        {"user_id": [7] * len(events_us),
         "ts": pd.to_datetime([u * 1000 for u in events_us], unit="ns")})
    return pd.concat(list(_session_fn((7,), iter([pdf]), state)),
                     ignore_index=True)


def test_session_fn_splits_on_gap_within_batch():
    """Two events 195 s apart in ONE batch: the first session must close
    immediately from the data branch (the engine timeout cannot have
    fired — same batch), leaving the second open in state."""
    state = _FakeState()
    t0 = 1_700_000_000_000_000  # us
    out = _run_session_fn([t0, t0 + 195_000_000], state)
    assert len(out) == 1
    assert (int(out["n_events"][0]), int(out["first_us"][0]),
            int(out["last_us"][0])) == (1, t0, t0)
    assert state.get == (1, t0 + 195_000_000, t0 + 195_000_000)


def test_session_fn_splits_against_carried_state():
    """Open state from a previous batch + a new event past the gap: the
    carried session closes, the new event starts fresh — the exact
    round-8 ADVICE scenario (user 2, 195 s across micro-batches)."""
    t0 = 1_700_000_000_000_000
    state = _FakeState((1, t0, t0))
    out = _run_session_fn([t0 + 195_000_000], state)
    assert len(out) == 1
    assert (int(out["n_events"][0]), int(out["first_us"][0]),
            int(out["last_us"][0])) == (1, t0, t0)
    assert state.get == (1, t0 + 195_000_000, t0 + 195_000_000)
    # timeout re-armed for the NEW session's last event + gap
    assert state.timeout_ms == (t0 + 195_000_000) // 1000 + 60_000


def test_session_fn_merges_within_gap_and_late_events():
    """Events within the gap (including a LATE one before the open
    session's first event) merge: append mode cannot retract, so
    backward splits are out of contract — first_us extends backward."""
    t0 = 1_700_000_000_000_000
    state = _FakeState((2, t0, t0 + 10_000_000))
    out = _run_session_fn([t0 - 5_000_000, t0 + 40_000_000], state)
    assert out.empty
    assert state.get == (4, t0 - 5_000_000, t0 + 40_000_000)


# ---------------------------------------------------------------------------
# 3. resample ESS Σwt² exactness where int64 would wrap
# ---------------------------------------------------------------------------

def test_resample_w2_decimal_exact_where_int64_wraps():
    """Plant weights whose Σwt² exceeds int64: the DECIMAL(19,0)·wt
    product path must produce the true value (to double rounding) in
    both engines, where the pre-fix raw BIGINT sum would wrap."""
    wt = 4_000_000_000  # 4e9 chars; wt² = 1.6e19 > int64 max per ONE term
    assert wt * wt > INT64_MAX  # the pre-fix sum wraps on the first row
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST(SUM(CAST(wt AS DECIMAL(19, 0)) * wt) AS DOUBLE) "
        "FROM (VALUES (CAST(4000000000 AS BIGINT)), "
        "(CAST(4000000000 AS BIGINT))) AS t(wt)").fetchone()[0]
    con.close()
    assert got == float(2 * wt * wt)


def test_resample_body_uses_decimal_w2():
    from project_etl_spark.operators.llm_curation import _RESAMPLE_BODY

    assert "CAST(wt AS DECIMAL(19, 0)) * wt" in _RESAMPLE_BODY
    assert "SUM(wt * wt)" not in _RESAMPLE_BODY


# ---------------------------------------------------------------------------
# 4. sweep normalizer must not conflate NaN with NULL
# ---------------------------------------------------------------------------

def test_oracle_sweep_norm_cell_distinguishes_nan_from_null():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "oracle_sweep",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "oracle_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._norm_cell(None) is None
    assert mod._norm_cell(float("nan")) == "nan"
    assert mod._norm_cell(float("nan")) != mod._norm_cell(None)
