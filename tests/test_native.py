"""Native C++ hull carver vs the NumPy reference paths."""
import numpy as np
import pytest

from splatfields_tpu import native
from splatfields_tpu.data import point_init
from splatfields_tpu.data.cameras import Camera

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C++ toolchain")


def make_cams(n=4, res=48, seed=0):
    rng = np.random.RandomState(seed)
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.cos(ang), 3 * np.sin(ang), 0.5]
        fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        up = np.array([0, 0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        # w2c with camera looking at origin (+z forward)
        R_c2w = np.stack([right, -true_up, fwd], axis=1)
        w2c = np.eye(4)
        w2c[:3, :3] = R_c2w.T
        w2c[:3, 3] = -R_c2w.T @ c2w[:3, 3]
        mask = (rng.rand(res, res) > 0.3).astype(np.float32)
        cam = Camera(
            uid=i, colmap_id=i, R=R_c2w, T=w2c[:3, 3], FoVx=0.9, FoVy=0.9,
            image_name=f"c{i}", image_width=res, image_height=res, fid=0.0,
            mask=mask[None])
        cams.append(cam)
    return cams


@needs_native
class TestNativeCarve:
    def test_mode0_matches_numpy(self):
        cams = make_cams()
        rng = np.random.RandomState(1)
        pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
        got = point_init.mask_filter_points(pts, cams, use_native=True)
        want = point_init.mask_filter_points(pts, cams, use_native=False)
        # allow a tiny tie-rounding band
        assert (got != want).mean() < 1e-3
        assert got.sum() > 0

    def test_mode1_matches_numpy_neus(self):
        from splatfields_tpu.data.readers import neus
        rng = np.random.RandomState(2)
        n_cams, res = 3, 40
        masks = (rng.rand(n_cams, res, res) > 0.3).astype(np.float32)
        KRT = []
        for i in range(n_cams):
            K = np.array([[40.0, 0, res / 2], [0, 40.0, res / 2], [0, 0, 1]])
            ang = 2 * np.pi * i / n_cams
            Rw = np.array([
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1.0]])
            t = np.array([0, 0, 3.0])
            KRT.append(K @ np.concatenate([Rw, t[:, None]], 1))
        KRT = np.stack(KRT).astype(np.float32)

        pts = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
        keep_native = native.carve_points(pts, KRT, list(masks), mode=1)

        # numpy reference mirroring neus.visual_hull_samples inner test
        keep_np = np.ones(pts.shape[0], bool)
        for ci in range(n_cams):
            proj = np.concatenate(
                [pts, np.ones_like(pts[:, :1])], 1) @ KRT[ci].T
            u = proj[:, 0] / proj[:, 2]
            v = proj[:, 1] / proj[:, 2]
            ui = np.clip(np.round(u).astype(int), 0, res - 1)
            vi = np.clip(np.round(v).astype(int), 0, res - 1)
            inb = (u >= 0) & (u <= res - 1) & (v >= 0) & (v <= res - 1)
            keep_np &= np.where(inb, masks[ci][vi, ui] > 0, False)
        assert (keep_native != keep_np).mean() < 1e-3
