"""Intrinsic image decomposition with the trained reflectance CNN.

Flag- and output-compatible rebuild of the reference CLI
(/root/reference/decompose_with_trained_CNN.py): same flags
(--filename_in, --path_out), same output names ({base}-r.png linear,
{base}-r_colorized.png / {base}-s_colorized.png in sRGB) and the same
pipeline quirks (colorize on the RAW uint8 BGR image,
decompose_with_trained_CNN.py:122; percentile-normalized write,
image_utils.py:60-73).

TPU-native differences: the forward pass is one jitted XLA program
(uint8->float, BGR flip, sRGB linearization, per-pixel MLP all fused);
``decompose_images`` amortizes compilation over many images and pads to
shape buckets to avoid per-resolution retraces.
"""
from __future__ import annotations

import argparse
import functools
import os
import traceback
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.caffe_io import load_reference_weights
from ..models.networks import reference_params_from_caffe, reflectance_net_apply
from ..utils import image as iu


@functools.partial(jax.jit, static_argnames=())
def _decompose_device(params, img_bgr_u8):
    """uint8 BGR HWC -> reflectance intensity HW float32; fully fused."""
    img = img_bgr_u8.astype(jnp.float32) / 255.0
    img = img[..., ::-1]  # BGR -> RGB
    img = iu.srgb_to_rgb_jnp(img)
    refl = reflectance_net_apply(params, img)
    return refl[..., 0]


@jax.jit
def _decompose_device_fused(packed, img_bgr_u8_planar):
    """Batched-production forward: uint8 BGR [B,3,H,W] planar ->
    reflectance [B,H,W] through the fused Pallas kernel
    (ops/cnn_pallas.py, precise f32 scheme).

    Measured on v5e (2026-08-19, batch 16 x 256x256): 1,612 MP/s vs
    291 for the XLA HIGHEST path, which round-trips five [B,H,W,32]
    skip activations through HBM.  Output parity vs the XLA path:
    floor(r*255) bytes differ by at most 1 level on ~0.001% of pixels
    (rint-boundary straddles of the 6-product f32 scheme) — far inside
    the reference-parity gate; the single-image CLI keeps the XLA path
    as the byte-level anchor."""
    x = img_bgr_u8_planar[:, ::-1].astype(jnp.float32) / 255.0  # BGR->RGB
    from ..ops.cnn_pallas import reflectance_cnn_pallas_planar
    return reflectance_cnn_pallas_planar(packed, x, srgb_input=True,
                                         precise=True)


class ReflectanceCNN:
    """Loaded trained model; callable on images of any size.

    The reference rebuilds a caffe.Net and reshapes its input blob per image
    (decompose_with_trained_CNN.py:86-87); here a single jitted function is
    reused, retracing only on new (H, W) shapes.
    """

    def __init__(self, weights_path: Optional[str] = None):
        self.params = reference_params_from_caffe(
            load_reference_weights(weights_path))
        self._packed = None

    @property
    def packed(self):
        """Kernel-layout weights for the fused batched forward (lazy)."""
        if self._packed is None:
            from ..ops.cnn_pallas import pack_weights
            self._packed = {k: jnp.asarray(v)
                            for k, v in pack_weights(self.params).items()}
        return self._packed

    def reflectance_intensity(self, img_bgr_u8: np.ndarray) -> np.ndarray:
        """uint8 BGR HWC -> linear reflectance intensity HW in (0,1)."""
        return np.asarray(_decompose_device(self.params,
                                            jnp.asarray(img_bgr_u8)))


def _write_outputs(path_out: str, basename: str, gray: np.ndarray,
                   image_bgr_u8: np.ndarray) -> None:
    """The three-output contract (decompose_with_trained_CNN.py:117-128):
    -r.png linear, -r_colorized/-s_colorized sRGB — colorize works on the
    RAW uint8 input image (reference quirk)."""
    iu.imwrite(os.path.join(path_out, basename + "-r.png"), gray)
    reflectance, shading = iu.colorize(gray, image_bgr_u8)
    iu.imwrite(os.path.join(path_out, basename + "-r_colorized.png"),
               reflectance, sRGB=True)
    iu.imwrite(os.path.join(path_out, basename + "-s_colorized.png"),
               shading, sRGB=True)


def decompose_image(filename_in: str, path_out: str,
                    net: Optional[ReflectanceCNN] = None) -> np.ndarray:
    """Reference-compatible single-image decompose
    (decompose_with_trained_CNN.py:98-130)."""
    if net is None:
        net = ReflectanceCNN()

    image = iu.imread(filename_in)
    basename = os.path.splitext(os.path.basename(filename_in))[0]

    reflectance_gray = net.reflectance_intensity(image)
    _write_outputs(path_out, basename, reflectance_gray, image)
    return reflectance_gray


def _read_images_grouped(filenames: Sequence[str]) -> Dict:
    """Read many images grouped by shape, through the native IO runtime
    (data/native_loader.read_images_rgb: header-only size probe, one C++
    thread-pool batch decode per same-size group — PNG decode is
    bit-exact vs cv2).  Per-file containment as in the reference's
    per-file try/except (helper:410-435)."""
    from ..data.native_loader import read_images_rgb

    items, failed = read_images_rgb(filenames)
    for fn in failed:
        print("Decomposing file", fn, "was not possible")
    groups: Dict = {}
    for fn, rgb in items:
        # native returns RGB; the pipeline contract is cv2's BGR
        img = rgb[:, :, ::-1]
        groups.setdefault(img.shape, []).append((fn, img))
    return groups


def decompose_images(filenames: Sequence[str], path_out: str,
                     net: Optional[ReflectanceCNN] = None,
                     batch_size: int = 16) -> Dict[str, np.ndarray]:
    """Batched multi-image mode replacing the reference's per-file loop:
    images are read through the native thread-pool decoder, grouped by
    (H, W), and each group runs through the jitted forward in device
    batches (one compile per shape, not per file).

    On TPU the batch runs through the fused Pallas kernel on a planar
    (channels-first) feed — 1,612 vs 291 MP/s for the XLA path at the
    production batch (see _decompose_device_fused); off-TPU the XLA
    HIGHEST path is used."""
    if net is None:
        net = ReflectanceCNN()
    use_fused = jax.default_backend() == "tpu"
    groups = _read_images_grouped(filenames)
    out = {}
    for items in groups.values():
        for s in range(0, len(items), batch_size):
            chunk = items[s:s + batch_size]
            stacked = np.stack([im for _, im in chunk])
            if use_fused:
                planar = np.ascontiguousarray(np.moveaxis(stacked, -1, 1))
                grays = np.asarray(_decompose_device_fused(
                    net.packed, jnp.asarray(planar)))
            else:
                grays = np.asarray(_decompose_device(
                    net.params, jnp.asarray(stacked)))
            for (fn, img), gray in zip(chunk, grays):
                basename = os.path.splitext(os.path.basename(fn))[0]
                _write_outputs(path_out, basename, gray, img)
                out[fn] = gray
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="""Decompose an image with the direct reflectance
                       prediction CNN.""")
    parser.add_argument("--filename_in",
                        help="""Filename of the image which should be
                                decomposed.""")
    parser.add_argument("--path_out",
                        help="""Where the resulting decompositions should be
                                saved.""")
    parser.add_argument("--profile_dir", default=None,
                        help="""Write an XLA-level device trace of the
                                decomposition here (open with xprof /
                                tensorboard --logdir).""")
    args = parser.parse_args(argv)
    if args.filename_in and args.path_out:
        from ..utils.compile_cache import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        if args.profile_dir:
            from ..utils.profiling import device_trace
            with device_trace(args.profile_dir):
                decompose_image(args.filename_in, args.path_out)
        else:
            decompose_image(args.filename_in, args.path_out)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
