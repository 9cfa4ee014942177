

def test_forecast_skill_bounds_and_coverage(spark, sf_dir):
    import pytest

    from mhw3d_detection_spark.queries.mhw import q_forecast_skill

    rows = q_forecast_skill(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_days"] > 0
        assert r["mae_clim"] >= 0 and r["mae_persist"] > 0
        # skill = 1 - mae_clim/mae_persist, consistent within rounding
        assert r["skill"] == pytest.approx(
            1.0 - r["mae_clim"] / r["mae_persist"], abs=1e-3
        )
