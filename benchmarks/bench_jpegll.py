"""JPEG Lossless codec throughput (io/jpeg_lossless.py, round-5).

Measures decode frames/s of the C++ scan loop vs the pure-Python fallback
on a CT-like 512x512 16-bit frame — the number that matters for reading a
compressed archive series (one frame per slice).

    python benchmarks/bench_jpegll.py
"""
import time

import numpy as np

from segmentation3d_tpu.io.jpeg_lossless import (
    _build_lut, _decode_scan_native, _decode_scan_py, _parse,
    encode_jpeg_lossless)


def main():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:512, 0:512]
    frame = (1024 + 6 * y + 4 * x
             + rng.integers(0, 32, (512, 512))).astype(np.uint16)
    t0 = time.perf_counter()
    blob = encode_jpeg_lossless(frame, precision=16)
    t_enc = time.perf_counter() - t0
    ratio = frame.nbytes / len(blob)
    info = _parse(blob)
    lut_sym, lut_len = _build_lut(*info["huff"][(0, 0)])
    f = info["frame"]
    args = (blob[info["scan_at"]:], lut_sym, lut_len, f["width"],
            f["height"], f["precision"], info["predictor"], info["pt"],
            info["ri"])

    out_n = _decode_scan_native(*args)
    if out_n is not None:
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            _decode_scan_native(*args)
        t_nat = (time.perf_counter() - t0) / reps
        print(f"native decode: {t_nat * 1e3:.1f} ms/frame "
              f"({1 / t_nat:.0f} frames/s, "
              f"{frame.nbytes / t_nat / 1e6:.0f} MB/s)")
    else:
        print("native codec unavailable")
    t0 = time.perf_counter()
    out_p = _decode_scan_py(*args)
    t_py = time.perf_counter() - t0
    print(f"python decode: {t_py * 1e3:.0f} ms/frame "
          f"({1 / t_py:.1f} frames/s)")
    if out_n is not None:
        np.testing.assert_array_equal(out_n, out_p)
        print(f"parity ok; native speedup {t_py / t_nat:.0f}x")
    print(f"encode (python): {t_enc * 1e3:.0f} ms/frame; "
          f"compression {ratio:.2f}x on the smooth+noise CT phantom")


if __name__ == "__main__":
    main()
