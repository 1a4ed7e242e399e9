"""Analysis document generator: compare reports → markdown.

The reference publishes its accuracy analysis as hand-written documents
(``fir_1d/docs/fir_1d_{3,5}tap_compare_analysis_v1.md`` — SURVEY.md
§2.4); here the same document structure is *generated* from the compare
summary JSON, so every number in the published analysis is reproducible
from artifacts: overall case-mean table, sample-weighted table, per-
coefficient rollup, worst cases, and the non-edge weighted aggregation
with the quantization-theory floor (RMSE ≥ √(1/12) ≈ 0.2887) used as
the acceptance interpretation.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore
from warmup_fir_filter_tpu.pipeline.report import summarize_weighted

QUANTIZATION_RMSE_FLOOR = float(np.sqrt(1.0 / 12.0))


def _table(headers: list[str], rows: list[list[str]]) -> str:
    lines = [
        "| " + " | ".join(headers) + " |",
        "|" + "|".join("---" for _ in headers) + "|",
    ]
    lines += ["| " + " | ".join(row) + " |" for row in rows]
    return "\n".join(lines)


def _fmt(value, digits=4) -> str:
    if isinstance(value, float):
        return f"{value:.{digits}f}"
    return str(value)


def generate_analysis_doc(
    store: ArtifactStore,
    *,
    tap: int,
    non_edge_exclude: tuple[str, ...] = ("edge",),
    output_path: Path | None = None,
) -> Path:
    """Render the {tap}-tap compare analysis markdown from the summary JSON."""
    json_path = store.report_dir(tap) / f"compare_{tap}tap_summary.json"
    if not json_path.exists():
        raise FileNotFoundError(
            f"Compare summary not found: {json_path}; run the report stage."
        )
    summary = json.loads(json_path.read_text())
    overall = summary["overall"]
    weighted = summary["weighted"]
    cases = summary["cases"]

    non_edge_rows = [
        r for r in cases if r["coeff_name"] not in non_edge_exclude
    ]
    non_edge = summarize_weighted(non_edge_rows)

    by_coeff = summary["by_coeff"]
    coeff_rows = [
        [
            name,
            str(group["num_cases"]),
            _fmt(group["avg_mae"]),
            _fmt(group["avg_rmse"]),
            _fmt(group["avg_sat_ratio"]),
            _fmt(group["avg_clip_needed_ratio"]),
        ]
        for name, group in by_coeff.items()
    ]

    worst_rows = [
        [
            str(i + 1),
            row["key"],
            _fmt(row["rmse"]),
            _fmt(row["mae"]),
            _fmt(row["max_abs_err"]),
        ]
        for i, row in enumerate(summary["worst_cases_by_rmse"])
    ]

    doc = f"""# Fixed vs Ideal Compare Analysis — {tap}-tap (generated)

Generated from `{json_path.name}` at {summary["generated_at_utc"]}.
Comparison: fixed (uint8, saturated) − ideal (float64, raw), per
`docs/fir1d_golden_spec.md`.

## 1. Overall (case-mean over {overall["num_cases"]} cases, \
{overall["num_samples_total"]:,} samples)

{_table(
    ["metric", "value"],
    [
        ["avg_mae", _fmt(overall["avg_mae"])],
        ["avg_rmse", _fmt(overall["avg_rmse"])],
        ["avg_mean_err", _fmt(overall["avg_mean_err"])],
        ["max_max_abs_err", _fmt(overall["max_max_abs_err"])],
        ["avg_sat_ratio", _fmt(overall["avg_sat_ratio"])],
        ["avg_clip_needed_ratio", _fmt(overall["avg_clip_needed_ratio"])],
    ],
)}

## 2. Sample-weighted

{_table(
    ["metric", "value"],
    [
        ["weighted_mae", _fmt(weighted["weighted_mae"])],
        ["weighted_rmse", _fmt(weighted["weighted_rmse"])],
        ["weighted_rmse_pooled", _fmt(weighted["weighted_rmse_pooled"])],
        ["weighted_mean_err", _fmt(weighted["weighted_mean_err"])],
        ["weighted_sat_ratio", _fmt(weighted["weighted_sat_ratio"])],
        ["weighted_psnr_db", _fmt(weighted["weighted_psnr_db"], 2) + " dB"],
    ],
)}

## 3. Per-coefficient rollup

{_table(
    ["coeff", "cases", "avg_mae", "avg_rmse", "avg_sat_ratio",
     "avg_clip_needed_ratio"],
    coeff_rows,
)}

## 4. Worst cases by RMSE

{_table(["#", "case", "rmse", "mae", "max_abs_err"], worst_rows)}

## 5. Non-edge acceptance view (excluding {', '.join(non_edge_exclude)})

{_table(
    ["metric", "value"],
    [
        ["weighted_mae", _fmt(non_edge["weighted_mae"])],
        ["weighted_rmse", _fmt(non_edge["weighted_rmse"])],
        ["weighted_psnr_db", _fmt(non_edge["weighted_psnr_db"], 2) + " dB"],
    ],
)}

Interpretation: uniform-quantization theory bounds the achievable RMSE at
√(1/12) ≈ {QUANTIZATION_RMSE_FLOOR:.4f} gray levels; low-pass class
filters must sit at or below this floor, while high-gain filters
(sharpen/edge) require clip-aware judgment — their error is dominated by
intentional saturation of out-of-range ideal values, quantified by
`clip_needed_ratio` / `sat_ratio` above, not by quantization noise.
"""
    output_path = (
        output_path
        if output_path is not None
        else store.report_dir(tap) / f"compare_{tap}tap_analysis.md"
    )
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(doc, encoding="utf-8")
    return output_path
