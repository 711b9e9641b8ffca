"""Local replica of the driver's Spark-vs-DuckDB oracle check.

Stricter than the driver: after canonicalization (columns sorted by
name, rows sorted by all columns, timestamps → ISO strings) we demand
cell-exact equality — floats included. Queries are engineered to be
bit-deterministic across engines (see queries/_det.py), so any float
drift is a bug, not noise.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from ..tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    errors: list = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for e in self.errors[:5]:
            msg += f"\n    - {e}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(_canon_obj)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.map(_sort_key)).reset_index(drop=True)
    return df


def _canon_obj(v):
    import datetime
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_obj(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_obj(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        return v.item()
    return v


def _sort_key(v):
    # total order across None/NaN and values
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return (0, "")
    return (1, str(v))


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name=name, ok=True, spark_rows=len(sdf), oracle_rows=len(odf))
    s, o = canonicalize(sdf), canonicalize(odf)
    if list(s.columns) != list(o.columns):
        res.ok = False
        res.errors.append(f"column mismatch: spark={list(s.columns)} oracle={list(o.columns)}")
        return res
    if len(s) != len(o):
        res.ok = False
        res.errors.append(f"row count mismatch: spark={len(s)} oracle={len(o)}")
        return res
    # Dtype-family strictness: the driver's value hash renders 1 (BIGINT)
    # and 1.0 (HUGEINT→float64) differently, so an int column on one side
    # and a float column on the other hash-mismatches even when every value
    # is numerically equal (round-1 q16/q23/q29 root cause). Catch that
    # here instead of coercing through float() below. Skipped for empty
    # frames (no values → driver hash trivially matches).
    if len(s):
        for c in s.columns:
            ks, ko = _dtype_family(s[c]), _dtype_family(o[c])
            if ks != ko:
                res.ok = False
                res.errors.append(
                    f"col {c!r} dtype-family mismatch: spark={s[c].dtype} ({ks}) "
                    f"oracle={o[c].dtype} ({ko}) — driver hash distinguishes int vs float"
                )
        if not res.ok:
            return res
    for c in s.columns:
        sv, ov = s[c], o[c]
        for i in range(len(sv)):
            a, b = sv.iloc[i], ov.iloc[i]
            if _cell_equal(a, b):
                continue
            res.ok = False
            res.errors.append(f"col {c!r} row {i}: spark={a!r} oracle={b!r}")
            if len(res.errors) >= 8:
                return res
    return res


def _dtype_family(s: pd.Series) -> str:
    """Collapse a pandas dtype to the family the driver's hash cares about:
    all integer widths are one family; float is another; bool, object,
    and everything else keep their numpy kind."""
    kind = s.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    return kind


def _cell_equal(a, b) -> bool:
    import numpy as np

    a_nan = a is None or (isinstance(a, float) and math.isnan(a)) or (a is pd.NaT)
    b_nan = b is None or (isinstance(b, float) and math.isnan(b)) or (b is pd.NaT)
    if a_nan or b_nan:
        return a_nan and b_nan
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        return float(a) == float(b)
    try:
        if bool(a == b):
            return True
    except Exception:
        pass
    return str(a) == str(b)


def run_compare(spark, qdef, sf_dir: str) -> CompareResult:
    from ..session import persistent_rdd_ids, release_new_persists

    # snapshot/release around the Spark side: queries with an in-plan
    # barrier (q25's persist(), the CC loop's localCheckpoints) pin
    # blocks per CALL — a long check session over 100 queries (or
    # pytest sweeping 6 fixture corpora) must not accumulate them
    before = persistent_rdd_ids(spark)
    try:
        sdf = qdef.fn(spark, sf_dir).toPandas()
    finally:
        release_new_persists(spark, before)
    if qdef.oracle is None:
        return CompareResult(name=qdef.name, ok=len(sdf) >= 0, spark_rows=len(sdf), oracle_rows=-1)
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(qdef.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(qdef.name, sdf, odf)
