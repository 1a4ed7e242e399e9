"""End-to-end pipeline/CLI tests (coverage the reference lacks)."""

import json

import numpy as np
import pytest

from warmup_fir_filter_tpu.cli import main, run_pipeline
from warmup_fir_filter_tpu.ops.qformat import QFormat
from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore
from warmup_fir_filter_tpu.utils.imageio import save_gray_png


@pytest.fixture
def image_dir(tmp_path, synthetic_rows):
    d = tmp_path / "img"
    d.mkdir()
    save_gray_png(d / "alpha.png", synthetic_rows)
    return d


def test_full_pipeline_end_to_end(image_dir, tmp_path):
    root = tmp_path / "artifacts"
    result = run_pipeline(
        image_dir=image_dir,
        artifact_root=root,
        tap="3",
        backend="golden",
    )
    store = ArtifactStore(root)
    assert result["stages"]["input"]["generated"] == 1
    assert result["stages"]["ideal_3tap"]["generated"] == 4
    assert result["stages"]["fixed_3tap"]["generated"] == 4
    assert result["stages"]["report_3tap"]["num_cases"] == 4
    assert result["stages"]["restore"]["converted"] == 8
    summary = json.loads(
        (store.report_dir(3) / "compare_3tap_summary.json").read_text()
    )
    assert summary["overall"]["num_cases"] == 4
    # moving_avg / simple_lp quantization error must be sub-LSB
    # (the reference's published acceptance interpretation, SURVEY.md §4.4).
    assert summary["by_coeff"]["simple_lp"]["avg_rmse"] < 1.0


def test_pipeline_resume_semantics(image_dir, tmp_path):
    root = tmp_path / "artifacts"
    run_pipeline(image_dir=image_dir, artifact_root=root, tap="3",
                 backend="golden")
    again = run_pipeline(image_dir=image_dir, artifact_root=root, tap="3",
                         backend="golden")
    assert again["stages"]["input"]["generated"] == 0
    assert again["stages"]["ideal_3tap"]["generated"] == 0
    assert again["stages"]["fixed_3tap"]["generated"] == 0


def test_pipeline_skip_flags(image_dir, tmp_path):
    root = tmp_path / "artifacts"
    result = run_pipeline(
        image_dir=image_dir, artifact_root=root, tap="3", backend="golden",
        skip_report=True, skip_restore=True,
    )
    assert "report_3tap" not in result["stages"]
    assert "restore" not in result["stages"]


def test_cli_main_exit_code_and_flags(image_dir, tmp_path, capsys):
    rc = main([
        "--image-dir", str(image_dir),
        "--artifact-root", str(tmp_path / "a"),
        "--tap", "3",
        "--backend", "golden",
        "--top-k", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[OK] pipeline" in out
    assert "[pipeline] generate input vectors" in out


def test_cli_custom_qformat(image_dir, tmp_path):
    root = tmp_path / "b"
    rc = main([
        "--image-dir", str(image_dir),
        "--artifact-root", str(root),
        "--tap", "3",
        "--backend", "golden",
        "--frac-bits", "8",
        "--acc-bits", "24",
        "--skip-report", "--skip-restore",
    ])
    assert rc == 0
    store = ArtifactStore(root)
    files = list(store.vector_dir("fixed", 3).glob("*.npy"))
    assert len(files) == 4
    # Spot check one file against the golden with the same custom format.
    from warmup_fir_filter_tpu.models.filters import FILTER_BANK_3TAP
    from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows

    x = np.load(store.input_vector_path("case_000_alpha"))
    qf = QFormat(frac_bits=8, acc_bits=24)
    expected = fir1d_fixed_golden_rows(
        x, np.asarray(FILTER_BANK_3TAP["edge"]), qf
    )
    got = np.load(
        store.output_vector_path("fixed", 3, "case_000_alpha", "edge")
    )
    np.testing.assert_array_equal(got, expected)
