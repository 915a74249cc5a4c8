"""Image-dedup pipeline (jobs.image_dedup): binary files → perceptual
fingerprints → Hamming clusters → keep-list."""

from __future__ import annotations

import os

import numpy as np

from hg_data_pipelines_spark.jobs import run_pipeline
from hg_data_pipelines_spark.multimodal import encode_image


def _img(seed=3):
    rng = np.random.RandomState(seed)
    base = np.add.outer(np.arange(64) * 2, np.arange(64) * 3) % 256
    return (base + rng.randint(0, 8, size=(64, 64))).astype(np.uint8)[
        :, :, None
    ].repeat(3, axis=2)


class TestImageDedupPipeline:
    def test_near_dup_removed_keep_list_kept(self, spark, tmp_path):
        imgs = str(tmp_path / "imgs")
        os.makedirs(imgs)
        a = _img()
        near = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        rng = np.random.RandomState(11)
        other = rng.randint(0, 256, size=a.shape, dtype=np.uint8)
        for name, arr in [("a.raw", a), ("a_near.raw", near), ("other.raw", other)]:
            with open(os.path.join(imgs, name), "wb") as fh:
                fh.write(encode_image(arr))

        ctx = run_pipeline(
            spark,
            "image_dedup",
            str(tmp_path / "wh"),
            {"images_dir": imgs, "max_hamming": 8},
        )
        assert ctx.reports["image_fingerprints"]["rows"] == 3
        kept = {
            os.path.basename(r["path"])
            for r in ctx.tables["image_keep_list"].collect()
        }
        # one of the near-dup pair dropped, the distinct image kept
        assert "other.raw" in kept
        assert len(kept) == 2
        assert {"a.raw", "a_near.raw"} & kept  # representative survives
