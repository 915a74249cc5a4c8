"""Geometry kernels vs the Python-reference oracle (SURVEY.md §5.2) plus
hypothesis property tests for the seam-wraparound invariants (§5.4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hg_data_pipelines_spark.functions import geometry as G

from reference_oracle import (
    oracle_grouping,
    oracle_iou,
    oracle_point_to_3d,
    oracle_theta_overlap,
)

W, H = 8000, 4000

# Bbox cases: plain, touching, nested, seam-crossing (>95% span), zero-area.
BBOXES = [
    [100.0, 200.0, 400.0, 800.0],
    [350.0, 500.0, 900.0, 1200.0],
    [100.0, 200.0, 400.0, 800.0],
    [7900.0, 100.0, 150.0, 700.0],      # stored wrapped (x_max < x_min)
    [50.0, 90.0, 7990.0, 600.0],        # raw span > 95% width → seam reorder
    [1000.0, 1000.0, 1000.0, 1500.0],   # zero width
    [2000.0, 300.0, 2500.0, 300.0],     # zero height
    [6000.0, 1000.0, 6500.0, 1400.0],
]


class TestIoUOracle:
    def test_pairwise_matrix_matches_oracle(self):
        arr = np.array(BBOXES)
        normalized = G.normalize_seam_bboxes(arr, W)
        got = G.bbox_iou_matrix(normalized, W)
        for i, a in enumerate(BBOXES):
            for j, b in enumerate(BBOXES):
                if i == j:
                    continue
                assert got[i, j] == pytest.approx(oracle_iou(a, b, W), abs=1e-12), (
                    f"IoU mismatch for pair ({i},{j})"
                )

    def test_grouping_matches_oracle(self):
        arr = np.array(BBOXES)
        normalized = G.normalize_seam_bboxes(arr, W)
        iou = G.bbox_iou_matrix(normalized, W)
        got = G.group_bboxes_greedy(iou, 0.01)
        expected = oracle_grouping(BBOXES, 0.01, W)
        assert list(got) == expected


class TestRayOracle:
    @pytest.mark.parametrize(
        "px,py,roll,pitch,heading,origin",
        [
            (0, 0, 0.0, 0.0, 0.0, (0.0, 0.0, 0.0)),
            (4000, 2000, 0.1, -0.05, 2.2, (582100.0, 6002250.0, 97.3)),
            (7999, 3999, -0.3, 0.2, -1.0, (1.0, 2.0, 3.0)),
            (123, 456, 0.02, 0.01, 3.7, (580000.0, 6000000.0, 50.0)),
        ],
    )
    def test_pixels_to_rays_matches_reference_math(
        self, px, py, roll, pitch, heading, origin
    ):
        got = G.pixels_to_rays(
            np.array([px]), np.array([py]), roll, pitch, heading,
            np.array(origin), W, H,
        )[0]
        exp = oracle_point_to_3d((px, py), roll, pitch, heading, origin, W, H)
        np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-9)


finite_theta = st.floats(
    min_value=-720, max_value=720, allow_nan=False, allow_infinity=False
)


class TestSeamProperties:
    @given(finite_theta, finite_theta, finite_theta, finite_theta)
    @settings(max_examples=300, deadline=None)
    def test_theta_overlap_symmetric_and_bounded(self, a1, a2, b1, b2):
        o1 = float(G.theta_overlap(a1, a2, b1, b2))
        o2 = float(G.theta_overlap(b1, b2, a1, a2))
        assert o1 == pytest.approx(o2, abs=1e-9)        # symmetric
        assert -1e-9 <= o1 <= 360 + 1e-9                 # bounded
        assert o1 == pytest.approx(
            oracle_theta_overlap(a1, a2, b1, b2), abs=1e-9
        )

    @given(
        st.floats(min_value=0, max_value=W - 1),
        st.floats(min_value=0, max_value=H - 1),
        st.floats(min_value=1, max_value=3000),
        st.floats(min_value=1, max_value=H / 2),
        st.floats(min_value=0, max_value=W),
    )
    @settings(max_examples=200, deadline=None)
    def test_iou_parity_under_wrap_shift(self, x, y, bw, bh, shift):
        """Engine ≡ reference oracle for any x-shift mod W.

        NOTE the reference's theta overlap is NOT mathematically
        shift-invariant: when exactly one interval crosses the seam and the
        other sits near 0°, bbox.py:71-96 computes 0 overlap (it extends
        only the crossing interval's max). Parity means replicating that
        quirk bit-for-bit, so the property checked here is engine==oracle
        on both the base and shifted pair — not invariance of the value.
        """
        y2 = min(y + bh, H)
        a = [x, y, min(x + bw, W), y2]
        b = [(x + bw / 3) % W, y, (x + bw / 3 + bw) % W, y2]

        def shifted(bb):
            return [(bb[0] + shift) % W, bb[1], (bb[2] + shift) % W, bb[3]]

        for pair in ([a, b], [shifted(a), shifted(b)]):
            exp = oracle_iou(pair[0], pair[1], W)
            got = G.bbox_iou_matrix(
                G.normalize_seam_bboxes(np.array(pair), W), W
            )[0, 1]
            assert got == pytest.approx(exp, abs=1e-9)


class TestRayMesh:
    def test_ray_triangle_hits_unit_wall(self):
        # Wall: unit square at z=5 in the x-y plane, two triangles.
        tris = np.array(
            [
                [[0, 0, 5], [1, 0, 5], [1, 1, 5]],
                [[0, 0, 5], [1, 1, 5], [0, 1, 5]],
            ],
            dtype=np.float64,
        )
        origins = np.zeros((3, 3))
        dirs = np.array([[0.05, 0.05, 1.0], [0.09, 0.09, 1.0], [-1, -1, 1.0]])
        pts = G.ray_triangle_intersections(origins, dirs, tris)
        np.testing.assert_allclose(pts[0], [0.25, 0.25, 5.0], atol=1e-9)
        np.testing.assert_allclose(pts[1], [0.45, 0.45, 5.0], atol=1e-9)
        assert np.isnan(pts[2]).all()  # miss

    def test_first_hit_wins(self):
        tris = np.array(
            [
                [[-5, -5, 10], [5, -5, 10], [0, 5, 10]],
                [[-5, -5, 2], [5, -5, 2], [0, 5, 2]],
            ],
            dtype=np.float64,
        )
        pts = G.ray_triangle_intersections(
            np.array([[0.0, 0.0, 0.0]]), np.array([[0.0, 0.0, 1.0]]), tris
        )
        np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-12)


class TestDbscan:
    def test_two_blobs_and_noise(self):
        rng = np.random.default_rng(42)
        a = rng.normal(0, 0.05, (30, 2))
        b = rng.normal(5, 0.05, (30, 2))
        noise = np.array([[2.5, 2.5]])
        x = np.vstack([a, b, noise])
        labels = G.dbscan(x, eps=0.5, min_samples=5)
        assert labels[60] == -1
        assert len({int(l) for l in labels[:30]}) == 1
        assert len({int(l) for l in labels[30:60]}) == 1
        assert labels[0] != labels[30]


class TestContours:
    """rle_to_polygon parity with the reference's mask→polygon step
    (Equirec2Perspec.py:122-128): real border following, not a bounding
    rect. Expected rings hand-checked: every point is a border pixel,
    consecutive points are 8-adjacent run endpoints, order is CCW from the
    topmost-leftmost pixel (cv2 outer-contour convention)."""

    @staticmethod
    def _counts_colmajor(mask):
        flat = mask.T.ravel()
        counts, run_val, run = [], 0, 0
        for v in flat:
            if v == run_val:
                run += 1
            else:
                counts.append(run)
                run_val, run = v, 1
        counts.append(run)
        return counts

    def test_l_shape_contour(self):
        m = np.zeros((5, 5), np.uint8)
        m[:, 0:2] = 1
        m[3:, :] = 1
        (ring,) = G.find_outer_contours(m)
        # down left flank, across bottom, up right edge, along arm top,
        # 8-connected diagonal into the inner corner, up the vertical arm
        assert ring.tolist() == [
            [0, 0], [0, 4], [4, 4], [4, 3], [2, 3], [1, 2], [1, 0]
        ]

    def test_rectangle_four_corners_ccw(self):
        m = np.zeros((6, 7), np.uint8)
        m[1:4, 2:6] = 1
        (ring,) = G.find_outer_contours(m)
        assert ring.tolist() == [[2, 1], [2, 3], [5, 3], [5, 1]]

    def test_multi_island_cv2_ordering(self):
        m = np.zeros((6, 6), np.uint8)
        m[0:2, 0:2] = 1   # first in raster order
        m[4:6, 4:6] = 1   # last in raster order
        contours = G.find_outer_contours(m)
        assert len(contours) == 2
        # cv2 4.x returns contours bottom-up: contours[0] is last-discovered
        assert contours[0].tolist() == [[4, 4], [4, 5], [5, 5], [5, 4]]
        assert contours[1].tolist() == [[0, 0], [0, 1], [1, 1], [1, 0]]

    def test_hole_yields_outer_contour_only(self):
        m = np.ones((7, 7), np.uint8)
        m[3, 3] = 0
        (ring,) = G.find_outer_contours(m)
        assert ring.tolist() == [[0, 0], [0, 6], [6, 6], [6, 0]]

    def test_thin_line_under_three_points_is_none(self):
        m = np.zeros((3, 5), np.uint8)
        m[1, 1:4] = 1
        assert G.rle_to_polygon(self._counts_colmajor(m), (3, 5)) is None

    def test_rle_to_polygon_l_shape_uncompressed_and_compressed(self):
        m = np.zeros((5, 5), np.uint8)
        m[:, 0:2] = 1
        m[3:, :] = 1
        counts = self._counts_colmajor(m)
        expected = [[0, 0], [0, 4], [4, 4], [4, 3], [2, 3], [1, 2], [1, 0]]
        uncompressed = " ".join(str(c) for c in counts)
        assert G.rle_to_polygon(uncompressed, (5, 5)).tolist() == expected
        compressed = G.coco_counts_encode(counts)
        assert G.rle_to_polygon(compressed, (5, 5)).tolist() == expected

    def test_compressed_rle_roundtrip_random_masks(self):
        rng = np.random.default_rng(1234)
        for _ in range(50):
            h, w = rng.integers(1, 15, 2)
            mask = (rng.random((h, w)) < 0.4).astype(np.uint8)
            counts = self._counts_colmajor(mask)
            enc = G.coco_counts_encode(counts)
            assert G.coco_counts_decode(enc) == counts
            np.testing.assert_array_equal(
                G.rle_decode_mask(enc, (h, w)),
                G.rle_decode_mask(counts, (h, w)),
            )

    def test_delta_coding_and_sign_extension(self):
        # counts beyond index 2 are delta-coded vs two back; negatives in
        # the delta stream exercise the 0x10 sign-extension path
        big = [100000, 12345, 1, 0, 7, 99999999, 3, 2]
        assert G.coco_counts_decode(G.coco_counts_encode(big)) == big


class TestBicubicWrap:
    """sample_bicubic_wrap vs a scalar (per-pixel loop) reference of the
    Keys a=-0.75 kernel with both-axis wrap — the cv2.remap(INTER_CUBIC,
    BORDER_WRAP) contract of Equirec2Perspec.py:89."""

    @staticmethod
    def _scalar_ref(img, x, y, a=-0.75):
        def k(t):
            t = abs(t)
            if t <= 1:
                return (a + 2) * t**3 - (a + 3) * t**2 + 1
            if t < 2:
                return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
            return 0.0

        h, w = img.shape[:2]
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        acc = 0.0
        for j in range(-1, 3):
            for i in range(-1, 3):
                wgt = k(x - (x0 + i)) * k(y - (y0 + j))
                acc += float(img[(y0 + j) % h, (x0 + i) % w]) * wgt
        return acc

    def test_matches_scalar_reference_on_gradient(self):
        rng = np.random.default_rng(99)
        yy, xx = np.mgrid[0:16, 0:20]
        img = (3.0 * xx + 2.0 * yy + 10 * np.sin(xx * 0.7) * np.cos(yy * 0.5)).astype(
            np.float64
        )
        xs = rng.uniform(0, 20, 40)
        ys = rng.uniform(0, 16, 40)
        xy = np.stack([xs, ys], axis=-1)
        got = G.sample_bicubic_wrap(img, xy)
        for n in range(40):
            assert got[n] == pytest.approx(
                self._scalar_ref(img, xs[n], ys[n]), abs=1e-9
            )

    def test_exact_at_integer_coords(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (12, 15)).astype(np.uint8)
        yy, xx = np.mgrid[2:10, 2:12]
        xy = np.stack([xx, yy], axis=-1).astype(np.float64)
        got = G.sample_bicubic_wrap(img, xy)
        np.testing.assert_array_equal(got, img[2:10, 2:12])

    def test_catmull_rom_reproduces_linear_ramp(self):
        # only a = -0.5 (Catmull-Rom) is exact on degree-1 polynomials;
        # cv2's a = -0.75 intentionally ripples gradients slightly
        yy, xx = np.mgrid[0:30, 0:30]
        img = (2.0 * xx + 3.0 * yy).astype(np.float64)
        xs = np.linspace(2.2, 26.7, 9)
        ys = np.linspace(2.4, 25.9, 9)
        xy = np.stack([xs, ys], axis=-1)
        got = G.sample_bicubic_wrap(img, xy, a=-0.5)
        np.testing.assert_allclose(got, 2.0 * xs + 3.0 * ys, atol=1e-9)

    def test_horizontal_wrap_continuity(self):
        # sampling across the seam must equal sampling the rolled image
        rng = np.random.default_rng(17)
        img = rng.uniform(0, 255, (8, 24)).astype(np.float64)
        xy_seam = np.stack([np.full(5, 23.5), np.linspace(2, 5, 5)], axis=-1)
        rolled = np.roll(img, 12, axis=1)
        xy_mid = xy_seam.copy()
        xy_mid[:, 0] = 11.5
        np.testing.assert_allclose(
            G.sample_bicubic_wrap(img, xy_seam),
            G.sample_bicubic_wrap(rolled, xy_mid),
            atol=1e-9,
        )

    def test_uint8_channels_saturate(self):
        img = np.zeros((6, 6, 3), np.uint8)
        img[2:4, 2:4] = 255  # overshoot region for cubic ringing
        xy = np.array([[[2.5, 2.5]], [[1.4, 1.4]]], dtype=np.float64)
        got = G.sample_bicubic_wrap(img, xy)
        assert got.dtype == np.uint8
        assert got.shape == (2, 1, 3)
        assert int(got[0, 0, 0]) == 255  # interior of bright block
