"""EuRoC IO integration: write a synthetic dataset in EuRoC layout (PNGs +
CSVs from the renderer), load it back through the full loader stack
(native C++ runtime when built), run the VIO driver path, and gate ATE."""
import os

import numpy as np
import pytest

from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig, FrontendConfig
from msckf_stereo_c_tpu.io import evaluate_ate
from msckf_stereo_c_tpu.io.euroc import load_images, load_sequence, synchronize_stereo
from msckf_stereo_c_tpu.sim import make_circle_trajectory, make_wall_landmarks, synthesize_imu
from msckf_stereo_c_tpu.sim.render import render_stereo_sequence


@pytest.fixture(scope="module")
def fake_euroc(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("fake_euroc") / "mav0"
    traj = make_circle_trajectory(duration=5.0)
    landmarks = make_wall_landmarks(num=400, radius=8.0, seed=1)
    imu = synthesize_imu(traj, gyro_noise=5e-4, acc_noise=5e-3, seed=0)
    frame_idx = np.arange(0, traj.t.shape[0], 10)[:60]
    img0, img1 = render_stereo_sequence(traj, landmarks, frame_idx, r_wall=8.0)

    t0_ns = 1403636579758555520
    os.makedirs(root / "imu0", exist_ok=True)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(imu.t)):
            ns = t0_ns + int(round(imu.t[i] * 1e9))
            g, a = imu.gyro[i], imu.acc[i]
            f.write(f"{ns},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}\n")

    for cam, imgs in (("cam0", img0), ("cam1", img1)):
        os.makedirs(root / cam / "data", exist_ok=True)
        with open(root / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for k, i in enumerate(frame_idx):
                ns = t0_ns + int(round(traj.t[i] * 1e9))
                name = f"{ns}.png"
                cv2.imwrite(str(root / cam / "data" / name), imgs[k].astype(np.uint8))
                f.write(f"{ns},{name}\n")

    os.makedirs(root / "state_groundtruth_estimate0", exist_ok=True)
    with open(root / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for i in frame_idx:
            ns = t0_ns + int(round(traj.t[i] * 1e9))
            p = traj.p[i]
            f.write(f"{ns},{p[0]},{p[1]},{p[2]},1,0,0,0\n")

    return str(root), traj, frame_idx


def test_load_sequence(fake_euroc):
    root, traj, frame_idx = fake_euroc
    seq = load_sequence(root)
    assert len(seq.imu.t) == len(traj.t)
    times, f0, f1 = synchronize_stereo(seq)
    assert len(times) == len(frame_idx)
    np.testing.assert_allclose(np.diff(times), 0.05, atol=1e-6)
    assert seq.gt is not None and len(seq.gt.t) == len(frame_idx)


def test_native_loader_matches_cv2(fake_euroc):
    root, _, _ = fake_euroc
    from msckf_stereo_c_tpu.io import native

    if not native.available():
        pytest.skip("native runtime not built")
    seq = load_sequence(root)
    _, f0, _ = synchronize_stereo(seq)
    imgs_native = load_images(f0[:5])
    import cv2

    for i in range(5):
        ref = cv2.imread(f0[i], cv2.IMREAD_GRAYSCALE).astype(np.float32)
        np.testing.assert_array_equal(imgs_native[i], ref)


def test_end_to_end_driver_ate(fake_euroc):
    """The full dataset->driver->ATE path (the reference's golden-trajectory
    test, README.md:53-88) on the synthetic EuRoC-format dataset."""
    from msckf_stereo_c_tpu.models.vio import run_vio_sequence

    root, traj, frame_idx = fake_euroc
    seq = load_sequence(root)
    times, f0, f1 = synchronize_stereo(seq)
    img0 = load_images(f0)
    img1 = load_images(f1)

    fcfg = FrontendConfig(max_features=64)
    mcfg = FilterConfig(max_cam_state_size=8, max_tracks=80, max_imu_per_frame=12)
    res = run_vio_sequence(
        fcfg, mcfg, EUROC_CALIB, times, img0, img1,
        seq.imu.t, seq.imu.gyro, seq.imu.acc, method="schur", chunk=30,
    )
    ate = evaluate_ate(res.times, res.positions, seq.gt.t, seq.gt.p)
    assert ate.num_pairs == len(times)
    # 3 s of motion on the synthetic world; the EuRoC bar is 0.13 m.
    assert ate.rmse < 0.13, f"driver-path ATE {ate.rmse}"


def test_image_source_chunked_equivalence_and_overlap(fake_euroc):
    """ImageSource: chunked reads across boundaries equal the one-shot
    decode, and with the native stream a chunk decoded DURING simulated
    device compute is served from the prefetch queue (decode/compute
    overlap — the reference's producer/consumer pipeline,
    run_euroc_muitl_threads.cpp:30-90, without its race)."""
    import time

    from msckf_stereo_c_tpu.io import native
    from msckf_stereo_c_tpu.io.euroc import ImageSource

    root, _, _ = fake_euroc
    seq = load_sequence(root)
    _, f0, _ = synchronize_stereo(seq)
    whole = load_images(f0)

    with ImageSource(f0, prefetch=len(f0)) as src:
        parts = [src.next(7) for _ in range((len(f0) + 6) // 7)]
    np.testing.assert_array_equal(np.concatenate(parts), whole)

    if not native.available():
        pytest.skip("native runtime not built")

    # Cold synchronous decode time of one 20-frame chunk.
    t0 = time.time()
    load_images(f0[:20])
    cold = time.time() - t0

    with ImageSource(f0, prefetch=64) as src:
        src.next(20)  # chunk 0 (cold)
        time.sleep(max(4 * cold, 0.5))  # "device compute": workers decode ahead
        t0 = time.time()
        src.next(20)  # chunk 1 should come from the prefetch queue
        warm = time.time() - t0
    # Generous bound (2-core CI box): the prefetched chunk must cost well
    # under the synchronous decode.
    assert warm < max(0.6 * cold, 0.15), (warm, cold)


def test_image_source_cv2_fallback(fake_euroc, monkeypatch):
    """Without the native runtime the source must fall back to synchronous
    cv2 decode with identical pixels and chunk semantics."""
    from msckf_stereo_c_tpu.io import native
    from msckf_stereo_c_tpu.io.euroc import ImageSource

    root, _, _ = fake_euroc
    seq = load_sequence(root)
    _, f0, _ = synchronize_stereo(seq)
    whole = load_images(f0[:10])

    monkeypatch.setattr(native, "available", lambda: False)
    with ImageSource(f0[:10]) as src:
        parts = [src.next(4), src.next(4), src.next(4)]  # last is short
    assert parts[2].shape[0] == 2
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_evaluate_ate_nonfinite_estimate_reports_inf():
    """A diverged estimate (NaN/inf positions) must report ATE=inf, not
    crash the Horn alignment (numpy SVD raises on non-finite input — hit
    by a filter blow-up during the round-5 klt_norm protocol)."""
    from msckf_stereo_c_tpu.io import evaluate_ate

    t = np.arange(10, dtype=np.float64) * 0.05
    gt = np.random.default_rng(0).normal(size=(10, 3))
    est = gt.copy()
    est[4] = np.nan
    out = evaluate_ate(t, est, t, gt)
    assert np.isinf(out.rmse) and np.isinf(out.max)
    assert out.num_pairs == 10
