"""Analysis-doc generation + profiling utilities tests."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.pipeline.analysis import generate_analysis_doc
from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore, save_npy
from warmup_fir_filter_tpu.pipeline.report import generate_compare_report
from warmup_fir_filter_tpu.utils.profiling import StageTimer, trace


@pytest.fixture
def reported_store(tmp_path):
    store = ArtifactStore(tmp_path / "artifacts")
    rng = np.random.default_rng(11)
    for stem in ("case_000_a", "case_001_b"):
        for coeff in ("moving_avg", "edge"):
            ideal = rng.uniform(-20, 280, size=(6, 9))
            fixed = np.clip(np.rint(ideal), 0, 255).astype(np.uint8)
            save_npy(store.output_vector_path("ideal", 3, stem, coeff), ideal)
            save_npy(store.output_vector_path("fixed", 3, stem, coeff), fixed)
    generate_compare_report(store, tap=3)
    return store


class TestAnalysisDoc:
    def test_generates_markdown_sections(self, reported_store):
        path = generate_analysis_doc(reported_store, tap=3)
        text = path.read_text()
        for section in (
            "# Fixed vs Ideal Compare Analysis — 3-tap",
            "## 1. Overall",
            "## 2. Sample-weighted",
            "## 3. Per-coefficient rollup",
            "## 4. Worst cases by RMSE",
            "## 5. Non-edge acceptance view",
            "0.2887",  # quantization floor
        ):
            assert section in text
        assert "| moving_avg |" in text
        assert "| edge |" in text

    def test_non_edge_excludes_edge_cases(self, reported_store):
        import json

        path = generate_analysis_doc(reported_store, tap=3)
        summary = json.loads(
            (reported_store.report_dir(3) / "compare_3tap_summary.json")
            .read_text()
        )
        from warmup_fir_filter_tpu.pipeline.report import summarize_weighted

        non_edge = summarize_weighted(
            [r for r in summary["cases"] if r["coeff_name"] != "edge"]
        )
        assert f"{non_edge['weighted_mae']:.4f}" in path.read_text()

    def test_missing_report_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="summary"):
            generate_analysis_doc(ArtifactStore(tmp_path), tap=5)


class TestProfiling:
    def test_stage_timer_line(self, capsys):
        with StageTimer("unit_stage", sol_msps=100.0) as timer:
            timer.add_samples(50_000)
        out = capsys.readouterr().out
        assert "[OK] unit_stage samples=50000" in out
        assert "sol_fraction=" in out
        assert timer.msps > 0

    def test_trace_noop_when_disabled(self, tmp_path):
        with trace(str(tmp_path), enabled=False):
            pass  # must not start the profiler at all

    def test_trace_best_effort(self, tmp_path):
        # Must never raise even if the backend can't profile.
        with trace(str(tmp_path / "prof")):
            _ = 1 + 1
