from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nifi_daffodil_spark.fixtures.walgen import WalSpec, generate_wal
from nifi_daffodil_spark.session import build_session

SPEC = WalSpec(n_events=4000, n_convs=80, turns_per_conv=30, n_segments=6, seed=42)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def wal(tmp_path_factory):
    d = tmp_path_factory.mktemp("wal")
    manifest = generate_wal(str(d), SPEC)
    manifest["dir"] = str(d)
    manifest["spec"] = SPEC
    return manifest


def assert_frames_equal(spark_df, oracle_pdf: pd.DataFrame) -> None:
    """Order-insensitive equality on (conv_id, turn_idx)-sorted frames."""
    got = spark_df.toPandas()
    got = got.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    exp = oracle_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    got = got.where(pd.notna(got), None)
    exp = exp.where(pd.notna(exp), None)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.datetime64) or np.issubdtype(e.dtype, np.datetime64):
            ok = (
                pd.to_datetime(g).astype("datetime64[ns]")
                .equals(pd.to_datetime(e).astype("datetime64[ns]"))
            )
        else:
            ok = g.astype(object).equals(e.astype(object))
        assert ok, f"column {c} differs:\n{pd.DataFrame({'got': g, 'exp': e})[g.astype(object) != e.astype(object)].head(10)}"
