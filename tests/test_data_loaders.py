"""Dataset loader tests against generated on-disk fixtures."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from tensoir_tpu.data.hdr import read_hdr, write_hdr
from tensoir_tpu.data import get_dataset


def _write_rgba(path, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.random((h, w, 4)) * 255).astype(np.uint8)
    arr[..., 3] = (arr[..., 3] > 64) * 255  # binary-ish alpha
    Image.fromarray(arr, "RGBA").save(path)


def _cam_transform(ang, r=4.0):
    from tensoir_tpu.data.ray_utils import look_at
    c2w = look_at([r * np.cos(ang), r * np.sin(ang), 1.0])
    m = np.concatenate([c2w, [[0, 0, 0, 1]]], 0)
    return ",".join(str(float(x)) for x in m.reshape(-1))


def _make_tensoir_fixture(root, n_views=2, rotations=("000", "120"),
                          light_name="sunset", general_names=None):
    os.makedirs(root, exist_ok=True)
    for split in ("train", "test"):
        for k in range(n_views):
            d = os.path.join(root, f"{split}_{k:03d}")
            os.makedirs(d, exist_ok=True)
            meta = {
                "imw": 16, "imh": 16, "cam_angle_x": 0.69,
                "cam_transform_mat": _cam_transform(k + (0.5 if split == "test" else 0)),
            }
            with open(os.path.join(d, "metadata.json"), "w") as f:
                json.dump(meta, f)
            if general_names:
                for name in general_names:
                    _write_rgba(os.path.join(d, f"rgba_{name}.png"), seed=k)
            else:
                for rot in rotations:
                    _write_rgba(os.path.join(d, f"rgba_{light_name}_{rot}.png"),
                                seed=k)
            _write_rgba(os.path.join(d, "albedo.png"), seed=k + 10)
            _write_rgba(os.path.join(d, "normal.png"), seed=k + 20)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((8, 16, 3)) * 10).astype(np.float32)
    path = os.path.join(tmp_path, "test.hdr")
    write_hdr(path, img)
    back = read_hdr(path)
    assert back.shape == (8, 16, 3)
    # RGBE shares one exponent across channels: error bound is ~1 ULP of the
    # per-pixel max channel
    ulp = img.max(-1, keepdims=True) / 128.0
    assert (np.abs(back - img) <= ulp + 1e-3).all()


def test_rotated_lights_loader(tmp_path):
    root = os.path.join(tmp_path, "armadillo")
    hdr_dir = os.path.join(tmp_path, "hdr")
    os.makedirs(hdr_dir)
    write_hdr(os.path.join(hdr_dir, "sunset.hdr"),
              np.ones((8, 16, 3), np.float32))
    _make_tensoir_fixture(root, rotations=("000", "120"))

    cls = get_dataset("tensoIR_unknown_rotated_lights")
    ds = cls(root, hdr_dir, split="train", light_rotation=["000", "120"],
             light_name="sunset")
    n = 2 * 2 * 16 * 16  # views * rotations * pixels
    assert ds.all_rays.shape == (n, 6)
    assert ds.all_rgbs.shape == (n, 3)
    assert ds.all_light_idx.shape == (n, 1)
    assert set(np.unique(ds.all_light_idx)) == {0, 1}
    assert ds.lights_probes is not None and ds.lights_probes.shape == (8, 16, 3)
    # ray dirs normalized (tensoIR_rotation_setting.py:110)
    norms = np.linalg.norm(ds.all_rays[:, 3:6], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    ds_test = cls(root, hdr_dir, split="test", light_rotation=["000", "120"],
                  light_name="sunset")
    item = ds_test[0]
    assert item["rgbs"].shape == (2, 256, 3)
    assert item["normals"].shape == (256, 3)
    assert item["albedo"].shape == (256, 3)


def test_general_multi_lights_loader(tmp_path):
    root = os.path.join(tmp_path, "ficus")
    names = ("sunset", "snow")
    _make_tensoir_fixture(root, general_names=names)
    cls = get_dataset("tensoIR_unknown_general_multi_lights")
    ds = cls(root, None, split="train", light_name_list=list(names))
    assert ds.light_num == 2
    assert ds.all_rays.shape[0] == 2 * 2 * 256


def test_relighting_test_loader(tmp_path):
    root = os.path.join(tmp_path, "scene")
    names = ("bridge", "city")
    _make_tensoir_fixture(root, general_names=names)
    cls = get_dataset("tensoIR_relighting_test")
    ds = cls(root, None, split="test", light_names=list(names))
    item = ds[0]
    assert item["rgbs"].shape == (2, 256, 3)
    assert item["normals"].shape == (256, 3)


def test_blender_loader(tmp_path):
    root = os.path.join(tmp_path, "lego")
    os.makedirs(root)
    frames = []
    for k in range(2):
        from tensoir_tpu.data.ray_utils import look_at
        c2w = look_at([4 * np.cos(k), 4 * np.sin(k), 1.0])
        m = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).tolist()
        frames.append({"file_path": f"./r_{k}", "transform_matrix": m})
        _write_rgba(os.path.join(root, f"r_{k}.png"), h=800 // 50, w=800 // 50,
                    seed=k)
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    cls = get_dataset("blender")
    ds = cls(root, split="train", downsample=50.0)
    assert ds.all_rays.shape == (2 * 16 * 16, 6)
    assert ds.all_rgbs.shape == (2 * 16 * 16, 3)


def test_simple_loader(tmp_path):
    root = os.path.join(tmp_path, "own")
    os.makedirs(root)
    frames = {}
    for k in range(3):
        from tensoir_tpu.data.ray_utils import look_at
        c2w = look_at([4 * np.cos(k), 4 * np.sin(k), 1.0])
        m = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).tolist()
        frames[str(k)] = {"file_path": f"img_{k}.png",
                          "transform_matrix": m, "light_idx": k % 2}
        _write_rgba(os.path.join(root, f"img_{k}.png"), seed=k)
    meta = {"camera_angle_x": 0.69, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)

    cls = get_dataset("tensoIR_simple")
    ds = cls(root, split="train", light_rotation=["000", "120"])
    # all 3 frames kept (light_idx 0/1 < light_num 2)
    assert ds.all_rays.shape[0] == 3 * 256
    assert set(np.unique(ds.all_light_idx)) == {0, 1}

    # synthetic orbit pose path (tensoIR_simple.py:84-155 test_new_pose)
    ds_orbit = cls(root, split="test", light_rotation=["000", "120"],
                   test_new_pose=True, n_orbit=12)
    assert len(ds_orbit) == 12
    item = ds_orbit[0]
    assert item["synthetic_pose"] and item["rays"].shape == (256, 6)
    # camera positions lie on a circle around the camera centroid
    cams = ds_orbit.orbit_poses[:, :, 3]
    # exact construction center: frame-camera centroid + default z offset
    frame_cams = np.stack([
        np.asarray(frames[str(k)]["transform_matrix"])[:3, 3]
        for k in range(3)])
    center = frame_cams.mean(0) + np.array([0.0, 0.0, 0.5])
    r = np.linalg.norm((cams - center)[:, :2], axis=-1)
    np.testing.assert_allclose(r, r[0], rtol=1e-4)
    # central ray points toward the orbit center
    mid = item["rays"][item["rays"].shape[0] // 2]
    to_center = center - mid[:3]
    to_center /= np.linalg.norm(to_center)
    d = mid[3:] / np.linalg.norm(mid[3:])
    assert float(d @ to_center) > 0.7


def test_importance_sampling_distribution(tmp_path):
    """Sampled texel frequencies must track the intensity*sin(theta) pdf
    (the CDF-inversion replacement for torch.multinomial)."""
    import jax
    from tensoir_tpu.models.env_light import EnvironmentLight

    rng = np.random.default_rng(0)
    img = rng.random((8, 16, 3)).astype(np.float32)
    img[2, 5] = 50.0  # one very bright texel
    hdr_dir = os.path.join(tmp_path, "h")
    os.makedirs(hdr_dir)
    write_hdr(os.path.join(hdr_dir, "sun.hdr"), img)
    env = EnvironmentLight(hdr_dir)

    d, rgb, pdf = env.sample_light("sun", 1, 20000, jax.random.PRNGKey(0))
    # the bright texel direction should dominate the draws; the pdf is
    # computed from the RGBE round-tripped image the light table actually
    # holds (quantized vs the original float img)
    img_rt = np.asarray(env.rgbs["sun"])
    bright_dir = np.asarray(env.dirs["sun"]).reshape(8, 16, 3)[2, 5]
    hits = (np.linalg.norm(np.asarray(d)[0] - bright_dir, axis=-1) < 1e-5)
    h_int = 1.0 / 8
    sin_t = np.sin(np.linspace(0.5 * h_int, np.pi - 0.5 * h_int, 8))
    p = img_rt.sum(-1) * sin_t[:, None]
    expected_frac = p[2, 5] / p.sum()
    assert abs(hits.mean() - expected_frac) < 0.02, (hits.mean(), expected_frac)
    # returned pdf matches the analytic pdf_return at that texel
    pdf_return = p / p.sum() * 8 * 16 / (2 * np.pi ** 2 * sin_t[:, None])
    got_pdf = np.asarray(pdf)[0][hits][:, 0]
    np.testing.assert_allclose(got_pdf, pdf_return[2, 5], rtol=1e-4)


def test_colmap_text_to_transforms(tmp_path):
    """colmap2nerf conversion math without the colmap binary: synthetic
    cameras.txt/images.txt -> transforms.json with the reference's
    colmap->nerf axis flips (colmap2nerf.py conventions)."""
    import json
    import math
    from tensoir_tpu.data.colmap2nerf import (_qvec2rotmat,
                                              colmap_text_to_transforms)

    # identity quaternion maps to identity rotation
    np.testing.assert_allclose(_qvec2rotmat([1.0, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # any unit quaternion yields a proper rotation
    q = np.array([0.5, 0.5, 0.5, 0.5])
    R = _qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12

    text = tmp_path / "text"
    text.mkdir()
    (text / "cameras.txt").write_text(
        "# cameras\n1 SIMPLE_RADIAL 800 600 700 400 300 0.01\n")
    # two frames: identity pose and a z-translated pose
    (text / "images.txt").write_text(
        "# images\n"
        "1 1 0 0 0 0 0 2 1 a.png\n"
        "pts\n"
        "2 1 0 0 0 0 0 4 1 b.png\n"
        "pts\n")
    out = tmp_path / "transforms.json"
    colmap_text_to_transforms(str(text), str(tmp_path / "images"), str(out))
    data = json.loads(out.read_text())
    assert data["w"] == 800 and data["h"] == 600
    assert abs(data["camera_angle_x"] - 2 * math.atan(800 / 1400)) < 1e-9
    assert abs(data["k1"] - 0.01) < 1e-12
    assert len(data["frames"]) == 2
    mats = [np.array(fr["transform_matrix"])
            for fr in data["frames"].values()]
    for m in mats:
        # c2w rotation stays orthonormal through the convention flips and
        # the up-reorientation
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-9)
    # scene normalization (reference colmap2nerf.py:268-301): cameras are
    # rescaled to an average distance of 4 from the recentered origin
    avglen = np.mean([np.linalg.norm(m[:3, 3]) for m in mats])
    np.testing.assert_allclose(avglen, 4.0, rtol=1e-6)
    for fr in data["frames"].values():
        assert fr["light_idx"] == 0


def test_hdr_plus_y_orientation(tmp_path):
    """'+Y H +X W' (bottom-up) Radiance files decode flipped to top-down —
    the cv2 path this replaces handles both orientations."""
    from tensoir_tpu.data.hdr import read_hdr, write_hdr
    rng = np.random.default_rng(1)
    img = (rng.random((6, 8, 3)) * 4).astype(np.float32)
    p_std = os.path.join(tmp_path, "std.hdr")
    write_hdr(p_std, img)
    std = read_hdr(p_std)
    # rewrite the same pixel payload under a +Y header: rows are stored
    # bottom-up, so decoding must flip back to the top-down image
    raw = open(p_std, "rb").read()
    head, _, body = raw.partition(b"-Y 6 +X 8\n")
    flipped_rows = np.frombuffer(body, np.uint8).reshape(6, 8, 4)[::-1]
    p_up = os.path.join(tmp_path, "up.hdr")
    with open(p_up, "wb") as fh:
        fh.write(head + b"+Y 6 +X 8\n" + flipped_rows.tobytes())
    up = read_hdr(p_up)
    np.testing.assert_array_equal(up, std)
