#!/usr/bin/env python
"""Plain-loop pure-Python twins of the multimodal fingerprint kernels.

These are the independent halves of the golden-fixture contract for
`ext_audio_spectral_flatness` (real-DFT Wiener entropy),
`ext_image_phash_dct` (orthonormal 2-D DCT-II perceptual hash),
`ext_image_ahash` / `ext_image_dhash` (block-mean spatial hashes), and
the PPM pixel statistics (`ppm_decode`): no numpy, no shared code with
project_etl_spark.operators.llm_multimodal — struct + math loops only,
written from the textbook definitions. The fixture generators
(gen_golden_flatness / gen_golden_phash / gen_golden_ahash /
gen_golden_dhash / gen_golden_ppm_stats) call THESE twins, so a bug
planted in the numpy kernels now fails the fixture-backed oracle
instead of being baked into the fixture (tests/test_round10_fixes.py
proves that sensitivity with deliberate off-by-ones).

Float contract: the spectral kernels quantize to 1e-6 units before
emitting, so twin and kernel agree exactly as long as the underlying
float64 values agree to ~1e-7 relative — verified exhaustively over
every payload at every fixture scale by tests/test_round10_fixes.py
(the numpy kernels use BLAS dot products whose summation order differs
from these loops; the quantization margin absorbs the last-ulp spread,
and the exhaustive sweep proves it for this corpus rather than assuming
it). The spatial kernels reduce in raster order (np.add.at is
sequential elementwise), so those twins match bit for bit by
construction; aHash's threshold compares RAW block means against
numpy's pairwise 16-value mean, and the same exhaustive sweep proves no
block mean sits within an ulp of the threshold anywhere in this corpus.
"""

from __future__ import annotations

import math
import struct


def pcm_flatness_py(blob: bytes) -> dict:
    """Plain-loop twin of `pcm_spectral_flatness`: int16-LE samples,
    frames of 16, real DFT power at the 8 non-DC bins, per-frame
    flatness = geometric mean / arithmetic mean of (power + 1),
    micro-quantized."""
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    n = int(blob[nl1 + 1:nl2])
    body = blob[nl2 + 1:nl2 + 1 + 2 * n]
    x = struct.unpack(f"<{n}h", body)
    n_frames = n // 16
    q = []
    for f in range(n_frames):
        frame = x[f * 16:(f + 1) * 16]
        log_sum = 0.0
        p_sum = 0.0
        for k in range(1, 9):
            re = 0.0
            im = 0.0
            for t in range(16):
                arg = 2.0 * math.pi * k * t / 16.0
                re += frame[t] * math.cos(arg)
                im += frame[t] * math.sin(arg)
            p = re * re + im * im + 1.0
            log_sum += math.log(p)
            p_sum += p
        gm = math.exp(log_sum / 8.0)
        am = p_sum / 8.0
        q.append(int(math.floor(gm / am * 1e6 + 0.5)))
    return {"n_frames": n_frames,
            "mean_flatness_micro": int(math.floor(sum(q) / n_frames + 0.5)),
            "min_flatness_micro": min(q),
            "n_tonal_frames": sum(1 for v in q if v < 200_000)}


def _ppm_parse_py(blob: bytes) -> tuple[int, int, list[float]]:
    """Parse a P6 PPM header + pixel bytes into (width, height, luma
    per pixel in raster order) with plain loops."""
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    nl3 = blob.index(b"\n", nl2 + 1)
    assert blob[:nl1] == b"P6"
    w_s, h_s = blob[nl1 + 1:nl2].split()
    width, height = int(w_s), int(h_s)
    px = blob[nl3 + 1:nl3 + 1 + width * height * 3]
    luma = []
    for i in range(width * height):
        r, g, b = px[3 * i], px[3 * i + 1], px[3 * i + 2]
        luma.append(r * 0.299 + g * 0.587 + b * 0.114)
    return width, height, luma


def ppm_phash_py(blob: bytes) -> dict:
    """Plain-loop twin of `ppm_phash`: luma -> 4x4 floor-mapped block
    means -> orthonormal 2-D DCT-II -> micro-quantized AC coefficients
    thresholded at their exact integer median -> 15-bit hash + DC."""
    width, height, luma = _ppm_parse_py(blob)
    sums = [0.0] * 16
    counts = [0] * 16
    for y in range(height):
        for xx in range(width):
            b = (y * 4 // height) * 4 + (xx * 4 // width)
            sums[b] += luma[y * width + xx]
            counts[b] += 1
    M = [[sums[i * 4 + j] / counts[i * 4 + j] for j in range(4)]
         for i in range(4)]
    # Orthonormal DCT-II basis: C[0][j] = 1/2, C[i][j] =
    # cos(pi*(2j+1)*i/8) * sqrt(1/2) for i > 0.
    C = [[(0.5 if i == 0 else
           math.cos(math.pi * (2 * j + 1) * i / 8.0) * math.sqrt(0.5))
          for j in range(4)] for i in range(4)]
    CM = [[sum(C[i][k] * M[k][j] for k in range(4)) for j in range(4)]
          for i in range(4)]
    D = [[sum(CM[i][k] * C[j][k] for k in range(4)) for j in range(4)]
         for i in range(4)]
    flat = [D[i][j] for i in range(4) for j in range(4)]
    acq = [int(math.floor(v * 1e6 + 0.5)) for v in flat[1:]]
    med = sorted(acq)[7]
    bits = [1 if v > med else 0 for v in acq]
    return {"width": width, "height": height,
            "phash": sum(1 << i for i in range(15) if bits[i]),
            "n_set_bits": sum(bits),
            "dc_q": int(math.floor(flat[0] * 1e6 + 0.5))}


def ppm_ahash_py(blob: bytes) -> dict:
    """Plain-loop twin of `ppm_ahash`: luma -> 4x4 floor-mapped block
    means -> one bit per block = mean > mean-of-means."""
    width, height, luma = _ppm_parse_py(blob)
    sums = [0.0] * 16
    counts = [0] * 16
    for y in range(height):
        for xx in range(width):
            b = (y * 4 // height) * 4 + (xx * 4 // width)
            sums[b] += luma[y * width + xx]
            counts[b] += 1
    means = [sums[i] / counts[i] for i in range(16)]
    overall = sum(means) / 16.0
    bits = [1 if m > overall else 0 for m in means]
    return {"width": width, "height": height,
            "ahash": sum(1 << k for k in range(16) if bits[k]),
            "n_set_bits": sum(bits)}


def ppm_dhash_py(blob: bytes) -> dict:
    """Plain-loop twin of `ppm_dhash`: micro-quantized 4x4 block means,
    one bit per horizontal neighbor pair with wrap-around."""
    width, height, luma = _ppm_parse_py(blob)
    sums = [0.0] * 16
    counts = [0] * 16
    for y in range(height):
        for xx in range(width):
            b = (y * 4 // height) * 4 + (xx * 4 // width)
            sums[b] += luma[y * width + xx]
            counts[b] += 1
    mq = [int(math.floor(sums[i] / counts[i] * 1e6 + 0.5))
          for i in range(16)]
    bits = [1 if mq[r * 4 + c] > mq[r * 4 + (c + 1) % 4] else 0
            for r in range(4) for c in range(4)]
    return {"width": width, "height": height,
            "dhash": sum(1 << i for i in range(16) if bits[i]),
            "n_set_bits": sum(bits)}


def ppm_decode_py(blob: bytes) -> dict:
    """Plain-loop twin of `ppm_decode`: per-channel means + luma range.
    Channel sums are integral (uint8 pixels), so the means are one
    exact integer sum divided once — order-free; per-pixel luma is the
    same fixed IEEE chain the kernel uses elementwise."""
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    nl3 = blob.index(b"\n", nl2 + 1)
    w_s, h_s = blob[nl1 + 1:nl2].split()
    width, height = int(w_s), int(h_s)
    maxval = int(blob[nl2 + 1:nl3])
    px = blob[nl3 + 1:nl3 + 1 + width * height * 3]
    n = width * height
    sr = sg = sb = 0
    luma = []
    for i in range(n):
        r, g, b = px[3 * i], px[3 * i + 1], px[3 * i + 2]
        sr += r
        sg += g
        sb += b
        luma.append(r * 0.299 + g * 0.587 + b * 0.114)
    return {"width": width, "height": height, "maxval": maxval,
            "mean_r": sr / n, "mean_g": sg / n, "mean_b": sb / n,
            "luma_min": min(luma), "luma_max": max(luma)}
