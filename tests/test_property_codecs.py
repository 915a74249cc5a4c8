"""Property tests for the pure codec / bit-packing functions.

All functions here are numpy-pure (no Spark), so hypothesis can drive
hundreds of cases cheaply. Round-trip exactness is the contract every
codec claims in its docstring.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hg_data_pipelines_spark.functions.geometry import (
    coco_counts_decode,
    coco_counts_encode,
    rle_decode_mask,
)
from hg_data_pipelines_spark.multimodal import (
    decode_image,
    decode_png,
    decode_video,
    encode_image,
    encode_png,
    encode_video,
)

_dims = st.integers(min_value=1, max_value=24)


def _img(draw, h, w, c, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    return a


@settings(max_examples=40, deadline=None)
@given(
    h=_dims, w=_dims, c=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip(h, w, c, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    got = decode_png(encode_png(a))
    np.testing.assert_array_equal(got, a)


@settings(max_examples=40, deadline=None)
@given(
    h=_dims, w=_dims, c=st.sampled_from([1, 2, 3]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_raw_image_round_trip(h, w, c, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_image(a)), a)


@settings(max_examples=25, deadline=None)
@given(
    f=st.integers(min_value=1, max_value=6),
    h=_dims, w=_dims,
    num=st.integers(min_value=1, max_value=120),
    den=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_video_round_trip(f, h, w, num, den, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(f, h, w, 3), dtype=np.uint8)
    got, fps = decode_video(encode_video(frames, fps=(num, den)))
    assert fps == (num, den)
    np.testing.assert_array_equal(got, frames)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40))
def test_coco_charcode_round_trip(counts):
    assert coco_counts_decode(coco_counts_encode(counts)) == counts


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_rle_mask_compressed_equals_uncompressed(h, w, seed):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(h, w) > 0.5).astype(np.uint8)
    # column-major run lengths, leading zero-run count first (COCO layout)
    flat = mask.flatten(order="F")
    counts, prev, run = [], 0, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    dec_u = rle_decode_mask(counts, (h, w))
    dec_c = rle_decode_mask(coco_counts_encode(counts), (h, w))
    np.testing.assert_array_equal(dec_u, mask)
    np.testing.assert_array_equal(dec_c, mask)
