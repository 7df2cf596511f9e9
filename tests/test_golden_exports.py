"""Golden-output parity (SURVEY §5 item 5): the reference commits its
real mart exports as de-facto goldens (``data/export/year=2024/...``);
here fixture-scale mart outputs are pinned under ``tests/goldens/`` and
every run must reproduce them byte-for-byte after canonicalization
(sorted columns, sorted rows, floats rounded to 6 decimals)."""

from __future__ import annotations

import pathlib

import pandas as pd
import pytest

from proyecto_final_de_big_data_spark.queries import QUERIES

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"
GOLDEN_MARTS = sorted(p.stem for p in GOLDEN_DIR.glob("*.csv"))


def _canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN_MARTS)
def test_mart_matches_golden(spark, sf_dir, name):
    got = _canonical(QUERIES[name].spark_fn(spark, sf_dir).toPandas())
    want = pd.read_csv(GOLDEN_DIR / f"{name}.csv")
    # round-trip through CSV so dtypes compare the way the golden stores them
    got = pd.read_csv(pd.io.common.StringIO(got.to_csv(index=False)))
    pd.testing.assert_frame_equal(got, want, check_exact=True)
