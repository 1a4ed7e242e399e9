"""Compare-report tests — coverage the reference lacks (SURVEY.md §4.3)."""

import csv
import json

import numpy as np
import pytest

from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore, save_npy
from warmup_fir_filter_tpu.pipeline.report import (
    compute_case_metrics,
    generate_compare_report,
    summarize_rows,
    summarize_weighted,
)


class TestCaseMetrics:
    def test_hand_computed_metrics(self):
        ideal = np.array([[0.0, 100.0, 300.0, -10.0]])
        fixed = np.array([[0, 98, 255, 0]], dtype=np.uint8)
        m = compute_case_metrics(ideal, fixed)
        # diffs: 0, -2, -45, 10
        assert m["num_samples"] == 4
        assert m["max_abs_err"] == 45.0
        assert m["mae"] == pytest.approx((0 + 2 + 45 + 10) / 4)
        assert m["rmse"] == pytest.approx(np.sqrt((4 + 2025 + 100) / 4))
        assert m["mean_err"] == pytest.approx((0 - 2 - 45 + 10) / 4)
        assert m["sat_low_ratio"] == 0.5   # two zeros
        assert m["sat_high_ratio"] == 0.25
        assert m["sat_ratio"] == 0.75
        assert m["clip_needed_ratio"] == 0.5  # 300 and -10
        assert m["psnr_db"] == pytest.approx(
            10 * np.log10(255**2 / ((4 + 2025 + 100) / 4))
        )

    def test_identical_arrays(self):
        a = np.full((3, 3), 7.0)
        m = compute_case_metrics(a, a.astype(np.uint8))
        assert m["rmse"] == 0.0 and m["psnr_db"] == float("inf")

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="Shape mismatch"):
            compute_case_metrics(np.zeros((2, 2)), np.zeros((2, 3)))


class TestSummaries:
    def test_weighted_vs_case_mean(self):
        rows = [
            {"num_samples": 100, "mae": 1.0, "rmse": 2.0, "mean_err": 0.5,
             "sat_ratio": 0.1, "clip_needed_ratio": 0.0},
            {"num_samples": 300, "mae": 3.0, "rmse": 4.0, "mean_err": -0.5,
             "sat_ratio": 0.3, "clip_needed_ratio": 0.2},
        ]
        w = summarize_weighted(rows)
        assert w["weighted_mae"] == pytest.approx((100 * 1 + 300 * 3) / 400)
        # Reference definition: weighted mean of per-case RMSEs
        # (fir_1d_5tap_compare_analysis_v1.md:56-67).
        assert w["weighted_rmse"] == pytest.approx((100 * 2 + 300 * 4) / 400)
        assert w["weighted_rmse_pooled"] == pytest.approx(
            np.sqrt((100 * 4 + 300 * 16) / 400)
        )
        assert w["weighted_psnr_db"] == pytest.approx(
            20 * np.log10(255 / w["weighted_rmse"])
        )

    def test_empty_rows(self):
        assert summarize_rows([])["num_cases"] == 0
        assert summarize_weighted([])["weighted_mae"] == 0.0


@pytest.fixture
def populated_store(tmp_path):
    store = ArtifactStore(tmp_path / "artifacts")
    rng = np.random.default_rng(7)
    for stem in ("case_000_a", "case_001_b"):
        for coeff in ("moving_avg", "edge"):
            ideal = rng.uniform(-20, 280, size=(6, 9))
            fixed = np.clip(np.rint(ideal), 0, 255).astype(np.uint8)
            save_npy(store.output_vector_path("ideal", 3, stem, coeff), ideal)
            save_npy(store.output_vector_path("fixed", 3, stem, coeff), fixed)
    return store


class TestGenerateReport:
    def test_csv_and_json_schema(self, populated_store):
        result = generate_compare_report(populated_store, tap=3, top_k=2)
        assert result["num_cases"] == 4
        with open(result["csv_path"]) as fp:
            rows = list(csv.DictReader(fp))
        assert len(rows) == 4
        assert rows[0]["key"] == "case_000_a__edge"
        payload = json.loads(open(result["json_path"]).read())
        for section in ("generated_at_utc", "config", "validation",
                        "overall", "weighted", "by_coeff",
                        "worst_cases_by_rmse", "cases"):
            assert section in payload
        assert len(payload["worst_cases_by_rmse"]) == 2
        assert set(payload["by_coeff"]) == {"moving_avg", "edge"}

    def test_missing_pair_detected_and_strict(self, populated_store):
        extra = populated_store.output_vector_path(
            "ideal", 3, "case_002_c", "edge"
        )
        save_npy(extra, np.zeros((2, 2)))
        result = generate_compare_report(populated_store, tap=3)
        assert result["validation_has_issue"]
        with pytest.raises(ValueError, match="strict"):
            generate_compare_report(populated_store, tap=3, strict=True)

    def test_invalid_filename_detected(self, populated_store):
        bad = populated_store.vector_dir("ideal", 3) / "garbage.npy"
        save_npy(bad, np.zeros((2, 2)))
        result = generate_compare_report(populated_store, tap=3)
        assert result["validation_has_issue"]

    def test_shape_mismatch_case_skipped(self, populated_store):
        path = populated_store.output_vector_path(
            "fixed", 3, "case_000_a", "moving_avg"
        )
        save_npy(path, np.zeros((1, 1), dtype=np.uint8))
        result = generate_compare_report(populated_store, tap=3)
        assert result["num_cases"] == 3
        assert result["validation_has_issue"]

    def test_no_pairs_raises(self, tmp_path):
        store = ArtifactStore(tmp_path / "a")
        store.vector_dir("ideal", 3).mkdir(parents=True)
        store.vector_dir("fixed", 3).mkdir(parents=True)
        with pytest.raises(ValueError, match="No matched"):
            generate_compare_report(store, tap=3)
