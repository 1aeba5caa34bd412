

def test_calibration_report_bins_and_known_rates(spark):
    """Hand-built scores/labels: a perfectly calibrated bin shows
    abs_gap 0; a maximally miscalibrated bin shows the full gap; scores
    at the top edge (1.0) fold into the last bin."""
    from pyspark.sql import functions as F

    from dataqtor_spark.operators import textstats as TX

    rows = (
        [(0.05, 0)] * 19 + [(0.05, 1)] * 1      # bin 0: rate 0.05 ~ score
        + [(0.95, 0)] * 20                       # bin 9: rate 0 vs 0.95
        + [(1.0, 1)] * 10                        # 1.0 folds into bin 9
    )
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: r for r in TX.calibration_report(
        df, F.col("p"), F.col("y") == 1).collect()}
    assert set(got) == {0, 9}
    b0 = got[0]
    assert b0["n_docs"] == 20 and b0["avg_score"] == 0.05
    assert b0["label_rate"] == 0.05 and b0["abs_gap"] == 0.0
    b9 = got[9]
    assert b9["n_docs"] == 30                    # 0.95s + the folded 1.0s
    assert abs(b9["avg_score"] - (20 * 0.95 + 10 * 1.0) / 30) < 1e-3
    assert b9["label_rate"] == round(10 / 30, 4)
