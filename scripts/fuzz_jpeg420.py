"""Randomized JPEG codec fuzz: 4:4:4 AND 4:2:0 (round 12) encode->decode
round trips across random sizes, contents, qualities, and restart
intervals — no Spark, pure codec.

Checked invariants per case:
- decode never raises on encoder output and returns the source shape;
- macroblock-constant color at quality 100 round-trips within the JFIF
  YCbCr integer rounding (<= 1 per channel; grayscale exact);
- arbitrary content stays within a quality-dependent error bound
  (DCT quantization + 2x2 chroma decimation);
- restart markers never change decoded pixels.

Usage: python scripts/fuzz_jpeg420.py [n_cases] [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from training_flink_sql_cc_src_spark.functions.media import (  # noqa: E402
    decode_jpeg_pixels,
    jpeg_bytes_with_pixels,
)


def _sim420(px: np.ndarray, rx: int = 2, ry: int = 2) -> np.ndarray:
    """Reference for the chroma DECIMATION itself (rx horizontal /
    ry vertical ratios: 2,2 = 4:2:0; 2,1 = 4:2:2; 1,2 = 4:4:0): JFIF
    YCbCr with the
    encoder's integer rounding, 2x2 box-averaged chroma, nearest
    (replication) upsample, inverse transform. Comparing decode output
    against THIS isolates codec error (DCT/quant/entropy/MCU walk)
    from the information the chroma decimation legitimately discards —
    random-noise chroma loses up to its full local amplitude, so a
    direct source comparison is not a meaningful invariant."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        np.rint(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255
    )
    cr = np.clip(
        np.rint(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255
    )
    h, w = y.shape
    hh, ww = h + (h % ry if ry > 1 else 0), w + (w % rx if rx > 1 else 0)

    def down_up(p):
        p = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
        small = p.reshape(hh // ry, ry, ww // rx, rx).mean(axis=(1, 3))
        return small.repeat(ry, axis=0).repeat(rx, axis=1)[:h, :w]

    cbu, cru = down_up(cb), down_up(cr)
    r2 = np.clip(np.rint(y + 1.402 * (cru - 128.0)), 0, 255)
    g2 = np.clip(
        np.rint(
            y - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
        ),
        0,
        255,
    )
    b2 = np.clip(np.rint(y + 1.772 * (cbu - 128.0)), 0, 255)
    return np.stack([r2, g2, b2], axis=2).astype(np.uint8)


def main(n_cases: int = 500, seed: int = 99) -> int:
    rng = np.random.RandomState(seed)
    failures = 0
    for case in range(n_cases):
        sub = rng.choice(["444", "420", "422", "440"])
        gray = rng.random() < 0.25
        kind = rng.choice(["mb_const", "gradient", "noise", "flat"])
        h = int(rng.randint(8, 70))
        w = int(rng.randint(8, 70))
        quality = int(rng.choice([100, 100, 95, 90, 85]))
        rst = int(rng.choice([0, 0, 0, 1, 2, 3]))
        try:
            if kind == "mb_const":
                # constant per 16x16 macroblock, padded grid
                mh, mw = -(-h // 16), -(-w // 16)
                if gray:
                    mb = rng.randint(0, 256, (mh, mw))
                    px = np.kron(mb, np.ones((16, 16), dtype=np.int64))
                else:
                    mb = rng.randint(0, 256, (mh, mw, 3))
                    px = np.kron(
                        mb, np.ones((16, 16, 1), dtype=np.int64)
                    )
                px = px[:h, :w].astype(np.uint8)
                quality = 100
                # macroblock-constant exactness needs the FULL
                # macroblock grid (edge-cropped partial blocks are
                # still constant, so the bound holds anyway)
            elif kind == "gradient":
                base = (
                    np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2
                )
                px = (base % 200 + 20).astype(np.uint8)
                if not gray:
                    px = np.stack(
                        [px, np.roll(px, 7, 0), np.roll(px, 3, 1)], axis=2
                    )
            elif kind == "flat":
                c = rng.randint(0, 256, 1 if gray else 3)
                px = np.full((h, w) if gray else (h, w, 3), 0, np.uint8)
                px[...] = c if gray else c[None, None, :]
            else:
                shape = (h, w) if gray else (h, w, 3)
                px = rng.randint(0, 256, shape).astype(np.uint8)
            data = jpeg_bytes_with_pixels(
                px, quality=quality, restart_interval=rst, subsampling=sub
            )
            out = decode_jpeg_pixels(data)
            assert out.shape == px.shape, (out.shape, px.shape)
            ratios = {"420": (2, 2), "422": (2, 1), "440": (1, 2)}
            ref = (
                _sim420(px, *ratios[sub])
                if (sub in ratios and not gray)
                else px
            )
            err = int(
                np.abs(out.astype(np.int64) - ref.astype(np.int64)).max()
            )
            if kind in ("mb_const", "flat") and quality == 100:
                bound = 0 if gray else 2  # YCbCr integer rounding
            elif quality == 100:
                # codec error only: DCT float round trip + the chroma
                # rounding interplay (vs the decimation reference)
                bound = 8
            elif kind == "noise":
                bound = 130
            else:
                bound = 80
            assert err <= bound, (kind, sub, gray, quality, err, bound)
            if rst:
                plain = decode_jpeg_pixels(
                    jpeg_bytes_with_pixels(
                        px, quality=quality, subsampling=sub
                    )
                )
                assert np.array_equal(out, plain), "restart changed pixels"
        except Exception as exc:  # noqa: BLE001 — fuzz: record and continue
            failures += 1
            print(
                f"FAIL case={case} kind={kind} sub={sub} gray={gray} "
                f"q={quality} rst={rst} shape=({h},{w}): {exc}",
                flush=True,
            )
        if (case + 1) % 100 == 0:
            print(f"... {case + 1}/{n_cases} ({failures} failures)", flush=True)
    print(f"DONE: {n_cases} cases, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    sys.exit(main(n, s))
