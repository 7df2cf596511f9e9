

def test_null_rows_do_not_bias_the_fit(spark):
    from proyecto_final_de_big_data_spark.operators.trend import (
        per_key_linear_trend,
    )

    rows = [("k", 0.0, 0.0), ("k", 1.0, 1.0), ("k", 2.0, 4.0),
            ("k", None, None)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = per_key_linear_trend(df, ["k"], "x", "y").first()
    assert out["n_points"] == 3
    assert out["slope"] == 2.0  # (0,0),(1,1),(2,4) exact OLS slope
