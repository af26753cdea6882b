"""Native C++ decode runtime: build, correctness vs PIL, loader wiring."""

import numpy as np
import pytest
from PIL import Image

from multiple_objects_gan_tpu.data.native_loader import decode_batch, get_lib


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    rgb = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    p = str(d / "a.png")
    Image.fromarray(rgb).save(p)
    paths.append((p, rgb))
    gray = (rng.rand(64, 64) * 255).astype(np.uint8)
    p = str(d / "b.png")
    Image.fromarray(gray, mode="L").save(p)
    paths.append((p, gray))
    p = str(d / "c.jpg")
    Image.fromarray(rgb).save(p, quality=95)
    paths.append((p, rgb))
    return paths


def test_native_lib_builds():
    assert get_lib() is not None, "C++ loader failed to build"


def test_png_rgb_native_size_bit_exact(images):
    p, rgb = images[0]
    out = decode_batch([p], 48, 48, 3)
    want = rgb.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out[0], want, atol=1e-6)


def test_png_gray_bit_exact(images):
    p, gray = images[1]
    out = decode_batch([p], 64, 64, 1)
    want = gray.astype(np.float32)[..., None] / 127.5 - 1.0
    np.testing.assert_allclose(out[0], want, atol=1e-6)


def test_jpeg_close_to_pil(images):
    p, _ = images[2]
    out = decode_batch([p], 48, 48, 3)
    pil = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1.0
    # independent JPEG IDCT implementations may differ by a few LSBs
    assert np.abs(out[0] - pil).max() < 0.05


def test_resize_matches_two_tap_bilinear(images):
    """The native resize is classic 2-tap bilinear (half-pixel centers) —
    NOT PIL's antialiased area filter. Datasets that need PIL-exact
    downscaling (coco/clevr) decode via PIL; the native fast path is used
    at native size. Verify the documented semantics against numpy."""
    p, rgb = images[0]
    out = decode_batch([p], 24, 24, 3)

    src = rgb.astype(np.float32)
    h, w = src.shape[:2]
    want = np.empty((24, 24, 3), np.float32)
    for oy in range(24):
        fy = (oy + 0.5) * h / 24 - 0.5
        y0 = min(int(fy) if fy >= 0 else 0, h - 1)
        y1 = min(y0 + 1, h - 1)
        wy = max(fy - y0, 0.0)
        for ox in range(24):
            fx = (ox + 0.5) * w / 24 - 0.5
            x0 = min(int(fx) if fx >= 0 else 0, w - 1)
            x1 = min(x0 + 1, w - 1)
            wx = max(fx - x0, 0.0)
            want[oy, ox] = ((1 - wy) * ((1 - wx) * src[y0, x0]
                                        + wx * src[y0, x1])
                            + wy * ((1 - wx) * src[y1, x0]
                                    + wx * src[y1, x1]))
    want = want / 127.5 - 1.0
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_missing_file_zero_filled(images, tmp_path):
    out = decode_batch([str(tmp_path / "nope.png"), images[0][0]], 48, 48, 3)
    np.testing.assert_allclose(out[0], 0.0)  # unreadable -> zeros, no crash
    assert np.abs(out[1]).max() > 0  # the good file still decodes


def test_uint8_native_size_bit_exact(images):
    """dtype=uint8 is the transport format: raw pixels, no normalize."""
    p, rgb = images[0]
    out = decode_batch([p], 48, 48, 3, dtype=np.uint8)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0], rgb)


def test_uint8_matches_f32_path_after_rounding(images):
    """The u8 and f32 native paths share one resize; u8 is the rounded
    pre-normalize value (exactly what PIL-then-ToTensor would produce)."""
    p, _ = images[0]
    u8 = decode_batch([p], 24, 24, 3, dtype=np.uint8)
    f32 = decode_batch([p], 24, 24, 3, dtype=np.float32)
    denorm = (f32[0] + 1.0) * 127.5
    assert np.abs(denorm - u8[0].astype(np.float32)).max() <= 0.5 + 1e-4


def test_uint8_gray(images):
    p, gray = images[1]
    out = decode_batch([p], 64, 64, 1, dtype=np.uint8)
    np.testing.assert_array_equal(out[0, ..., 0], gray)


def _idle_cores() -> float:
    """Cores this process may use MINUS current load — cpu_count alone
    overstates on quota'd/contended hosts (ADVICE r3)."""
    import os

    try:
        allowed = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        allowed = os.cpu_count() or 1
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = 0.0
    return allowed - load1


@pytest.mark.skipif(_idle_cores() < 1.7,
                    reason="thread-pool scaling needs ~2 IDLE cores "
                           "(affinity minus 1-min load; decode_batch "
                           "clamps threads to cpu_count)")
def test_decode_throughput_scales_with_threads(tmp_path_factory):
    """The C++ thread pool must deliver real parallel decode: >= 1.4x
    throughput from 1 -> 2 threads on a multi-core host (ROADMAP claim;
    skipped when fewer than ~2 cores are actually idle — CPU quotas and
    CI contention would flake the wall-clock assertion).
    """
    import time

    if get_lib() is None:
        pytest.skip("native loader unavailable")
    d = tmp_path_factory.mktemp("scale_imgs")
    rng = np.random.RandomState(3)
    paths = []
    for i in range(96):
        arr = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
        p = str(d / f"s_{i:03d}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)

    def best_time(threads, rounds=5):
        decode_batch(paths, 128, 128, 3, threads=threads)  # warm page cache
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            decode_batch(paths, 128, 128, 3, threads=threads)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(1)
    t2 = best_time(2)
    assert t1 / t2 >= 1.4, (
        f"1->2 thread speedup only {t1 / t2:.2f}x (t1={t1*1e3:.1f}ms, "
        f"t2={t2*1e3:.1f}ms)")
