"""Generate tests/fixtures/guided_golden.npz from the independent C++
transcription oracle (tests/guided_cpp_oracle.py).

Run: python tests/make_guided_fixtures.py   (deterministic; rewrites the
npz bit-identically).  The fixtures are CHECKED IN so the gate in
tests/test_guided_golden.py fails if either the product filters or the
committed oracle drift; see guided_cpp_oracle.py's docstring for why a
transcription oracle stands in for the unacquirable ximgproc binary.

Provenance: on any machine WITH opencv-contrib,
``python scripts/regen_guided_fixtures.py`` recomputes every out_* key
from the real cv2.ximgproc.guidedFilter binary on these same inputs and
diffs against the committed npz (``--write`` adopts the binary's
outputs) — the one-command check that closes the transcription-risk gap
the moment egress exists.

Combos (VERDICT r2 item 1): r in {3, 45, 52}, eps in {3, 7}, gray and
color guides.  r=3 runs on a 96x128 image (interior-dominated); r=45/52
run on 128x160 (EVERY pixel is within r of a border there, so a wrong
border mode — BORDER_REFLECT vs _101 — or wrong normalization shows up
everywhere, not just in a thin frame).
"""
import os

import numpy as np

from guided_cpp_oracle import (guided_filter_cpp_color,
                               guided_filter_cpp_gray)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "guided_golden.npz")


def make_images():
    """Deterministic test content: smooth shading x piecewise-flat
    reflectance + a hard circle edge + noise — edges/flats exercise the
    a,b extremes, the border band exercises the reflect pad."""
    rng = np.random.RandomState(1234)
    out = {}
    for key, (h, w) in (("small", (96, 128)), ("big", (128, 160))):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        shade = 0.55 + 0.45 * np.sin(xx / (w / 9.0)) * np.cos(yy / (h / 7.0))
        refl = np.full((h, w, 3), 0.35, np.float32)
        refl[(yy.astype(int) // (h // 4) + xx.astype(int) // (w // 5))
             % 2 == 0] = [0.8, 0.55, 0.3]
        rr = (yy - h * 0.4) ** 2 + (xx - w * 0.3) ** 2
        refl[rr < (min(h, w) * 0.22) ** 2] = [0.2, 0.7, 0.75]
        img = refl * shade[..., None] * 255.0
        img += 6.0 * rng.rand(h, w, 3)
        guide_color = np.clip(img, 0, 255).astype(np.uint8)
        # src = a reflectance-like gray image correlated with the guide
        src_gray = np.clip(refl.mean(-1) * 255.0 + 4.0 * rng.rand(h, w),
                           0, 255).astype(np.uint8)
        guide_gray = np.clip(0.299 * img[..., 2] + 0.587 * img[..., 1]
                             + 0.114 * img[..., 0], 0, 255).astype(np.uint8)
        out[key] = (guide_color, guide_gray, src_gray)
    return out


def main():
    images = make_images()
    data = {}
    for key, (gc, gg, src) in images.items():
        data["img_{}_guide_color".format(key)] = gc
        data["img_{}_guide_gray".format(key)] = gg
        data["img_{}_src".format(key)] = src
    for radius in (3, 45, 52):
        key = "small" if radius == 3 else "big"
        gc, gg, src = images[key]
        for eps in (3.0, 7.0):
            tag = "r{}_e{}".format(radius, int(eps))
            data["out_{}_color".format(tag)] = guided_filter_cpp_color(
                gc, src, radius, eps)
            data["out_{}_gray".format(tag)] = guided_filter_cpp_gray(
                gg, src, radius, eps)
            # the product CLI case: src filtered against itself-ish
            # 3-channel guide with COLOR src too (covers multi-channel)
            data["out_{}_colorsrc".format(tag)] = guided_filter_cpp_color(
                gc, gc, radius, eps)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **data)
    print("wrote", FIXTURE, "keys:", len(data))


if __name__ == "__main__":
    main()
