"""Image-restore tests — coverage the reference lacks (SURVEY.md §4.3)."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.pipeline.artifacts import ArtifactStore, save_npy
from warmup_fir_filter_tpu.pipeline.restore import (
    convert_to_image_u8,
    restore_images,
    to_u8_clip,
    to_u8_normalized,
)


class TestConversionPolicies:
    def test_clip_policy(self):
        arr = np.array([[-10.5, 0.4, 127.5, 300.0]])
        out = to_u8_clip(arr)
        # rint ties-to-even: 127.5 → 128
        np.testing.assert_array_equal(out, [[0, 0, 128, 255]])
        assert out.dtype == np.uint8

    def test_normalize_policy(self):
        # 255/2 = 127.5 is exactly representable; rint ties-to-even → 128.
        arr = np.array([[0.0, 1.0, 2.0]])
        np.testing.assert_array_equal(to_u8_normalized(arr), [[0, 128, 255]])

    def test_normalize_constant_array(self):
        np.testing.assert_array_equal(
            to_u8_normalized(np.full((2, 2), 9.0)), np.zeros((2, 2))
        )

    def test_fixed_passthrough(self):
        arr = np.array([[1, 2]], dtype=np.uint8)
        assert convert_to_image_u8(arr, kind="fixed") is arr

    def test_1d_rejected(self):
        with pytest.raises(ValueError, match="2D"):
            convert_to_image_u8(np.zeros(4), kind="fixed")


@pytest.fixture
def store_with_vectors(tmp_path):
    store = ArtifactStore(tmp_path / "artifacts")
    rng = np.random.default_rng(3)
    for tap in (3, 5):
        ideal = rng.uniform(-5, 260, size=(4, 6))
        fixed = np.clip(np.rint(ideal), 0, 255).astype(np.uint8)
        save_npy(store.output_vector_path("ideal", tap, "case_000_x", "edge"),
                 ideal)
        save_npy(store.output_vector_path("fixed", tap, "case_000_x", "edge"),
                 fixed)
    return store


class TestRestoreImages:
    def test_full_restore(self, store_with_vectors):
        summary = restore_images(store_with_vectors)
        assert summary["num_converted"] == 4
        for kind in ("ideal", "fixed"):
            for tap in (3, 5):
                pngs = list(
                    store_with_vectors.restored_dir(kind, tap).glob("*.png")
                )
                assert len(pngs) == 1

    def test_idempotent_skip_with_reason(self, store_with_vectors):
        restore_images(store_with_vectors)
        summary = restore_images(store_with_vectors)
        assert summary["num_converted"] == 0
        assert summary["num_skipped"] == 4
        assert all(
            "exists" in item["reason"] for item in summary["skipped"]
        )

    def test_normalize_policy_separate_dir(self, store_with_vectors):
        restore_images(store_with_vectors, kind="ideal",
                       ideal_policy="normalize")
        d = store_with_vectors.restored_dir(
            "ideal", 3, ideal_policy="normalize"
        )
        assert d.name == "ideal_3tap_normalize"
        assert len(list(d.glob("*.png"))) == 1

    def test_unrecognized_file_skipped_or_strict(self, store_with_vectors):
        bad = store_with_vectors.vector_dir("fixed", 3) / "junk.npy"
        save_npy(bad, np.zeros((2, 2), dtype=np.uint8))
        summary = restore_images(store_with_vectors, kind="fixed", taps=(3,))
        assert any(
            item["file"] == "junk.npy" for item in summary["skipped"]
        )
        with pytest.raises(ValueError, match="strict"):
            restore_images(store_with_vectors, kind="fixed", taps=(3,),
                           overwrite=True, strict=True)

    def test_bad_policy_rejected(self, store_with_vectors):
        with pytest.raises(ValueError, match="ideal_policy"):
            restore_images(store_with_vectors, ideal_policy="stretch")
