"""AOT export of the flagship forward for serving (jax.export).

A serving process should not need this repo's Python graph-construction
code (or a caffemodel parse) at startup: ``export_flagship`` serializes
the batched-production forward — uint8 BGR [B, 3, H, W] planar in,
reflectance intensity [B, H, W] out, the exact pipeline
``cli.decompose.decompose_images`` runs on TPU (fused Pallas kernel,
precise f32 scheme, weights baked in as constants) — as a
version-checked StableHLO artifact (``jax.export``).  A consumer calls
``load_flagship(path)`` and gets a plain callable; only jax and the
artifact file are needed.

The reference has no serving story at all (its CLI rebuilds a caffe.Net
per image, decompose_with_trained_CNN.py:100-106); this is the
TPU-native equivalent of shipping a frozen prototxt+caffemodel pair
(network_definition.prototxt — SURVEY C7) in compiled form.

Build an artifact:
    python -m reflectance_filtering_tpu.utils.serving \
        --out flagship_b16_256.rfx --batch 16 --height 256 --width 256

The artifact is platform-tagged (default: tpu).  Exporting for 'tpu'
works from any host — lowering needs no device — and Mosaic verifies
the kernels at export time, so a broken kernel fails the build, not the
serving fleet.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _flagship_fn(use_pallas: bool):
    """The batched-production forward with weights closed over as
    constants (they bake into the artifact).

    use_pallas selects the fused kernel (TPU artifacts — what
    decompose_images runs on chip); other platforms get the XLA HIGHEST
    forward, the same dispatch the product uses off-TPU (Pallas has no
    CPU/GPU lowering).  Both share the uint8-planar-BGR interface."""
    if use_pallas:
        # reuse the PRODUCT forward itself (not a re-implementation):
        # bit-identity between artifacts and decompose_images holds by
        # construction, and a product change cannot silently diverge
        from ..cli.decompose import ReflectanceCNN, _decompose_device_fused

        packed = ReflectanceCNN().packed

        def forward(img_bgr_u8_planar):
            return _decompose_device_fused(packed, img_bgr_u8_planar)
    else:
        from ..models.caffe_io import load_reference_weights
        from ..models.networks import (reference_params_from_caffe,
                                       reflectance_net_apply)
        from .image import srgb_to_rgb_jnp

        params = reference_params_from_caffe(load_reference_weights())

        def forward(img_bgr_u8_planar):
            x = img_bgr_u8_planar[:, ::-1].astype(jnp.float32) / 255.0
            lin = srgb_to_rgb_jnp(jnp.moveaxis(x, 1, -1))
            return reflectance_net_apply(params, lin)[..., 0]

    return forward


def _pipeline_fn(kind: str, use_pallas: bool):
    """'cnn' -> reflectance map; 'bf' -> BF(CNN,CNN) c20 s22; 'gf' ->
    GF(CNN, image) r45 e3 — the paper's flagship filtered configs
    (README.md:34,58), end to end from the uint8 planar BGR batch to
    the filtered reflectance [B, H, W].  Filter outputs go through the
    product's uint8 byte path (clip(rint(q), 0, 255) — the CLI's write
    contract, ops/bilateral.py:184 / ops/guided.py), returned as
    uint8-VALUED float32; 'cnn' returns the raw intensity in (0, 1)."""
    cnn = _flagship_fn(use_pallas)
    if kind == "cnn":
        return cnn

    def pipeline(img_bgr_u8_planar):
        refl = cnn(img_bgr_u8_planar)
        # the -r.png byte path: floor(r*255) (sigmoid < 1 never triggers
        # the percentile normalize — image_utils.py:60-92)
        r_u8 = jnp.floor(refl * 255.0)
        if kind == "bf":
            if use_pallas:
                from ..ops.bilateral_pallas import (
                    bilateral_gray_self_batched)
                # -r.png decodes to 3 identical channels (reps=3)
                q = bilateral_gray_self_batched(r_u8, -1, 20.0, 22.0)
            else:
                from ..ops.bilateral import joint_bilateral_filter
                rep = jnp.repeat(r_u8[..., None], 3, axis=-1)
                q = jax.vmap(lambda j: joint_bilateral_filter(
                    j, j, -1, 20.0, 22.0))(rep)[..., 0]
        elif kind == "gf":
            # guidance = the original photo (RGB planar, 0-255)
            guide = img_bgr_u8_planar[:, ::-1].astype(jnp.float32)
            if use_pallas:
                from ..ops.guided import guided_filter_planar_pallas
                q = guided_filter_planar_pallas(guide, r_u8[:, None],
                                                45, 3.0, guide_u8=True)[:, 0]
            else:
                # fully-XLA form (the "planar xla" path still uses
                # Pallas box kernels, which have no CPU lowering)
                from ..ops.guided import guided_filter
                q = guided_filter(jnp.moveaxis(guide, 1, -1), r_u8,
                                  45, 3.0, batched=True)
        else:
            raise ValueError("unknown pipeline '{}'".format(kind))
        # the product's uint8 write path: GF overshoots [0,255] (q =
        # a*I + b is unbounded), so a consumer casting raw floats to
        # uint8 would wrap around
        return jnp.clip(jnp.round(q), 0.0, 255.0)

    return pipeline


def export_flagship(path: str, batch: int, height: int, width: int,
                    platforms=("tpu",), pipeline: str = "cnn",
                    symbolic: bool = False) -> int:
    """Serialize a flagship pipeline; returns the artifact size in
    bytes.  Input spec: uint8 [batch, 3, height, width] planar BGR
    (what the native batch decoder produces after the host-side
    moveaxis).  pipeline: 'cnn' (reflectance map), 'bf' (BF(CNN,CNN)
    c20 s22) or 'gf' (GF(CNN, image) r45 e3).

    symbolic=True exports ONE any-shape artifact (symbolic batch/H/W —
    the compiled form of the reference's fully-convolutional
    reshape-per-image trick, decompose_with_trained_CNN.py:86-87).
    Only pipeline='cnn' and only the XLA forward: the Pallas kernels'
    grids are computed from concrete shapes, so the fast fixed-shape
    artifacts and the flexible symbolic one are complementary — serve
    the common shapes from fixed artifacts, the long tail from the
    symbolic one."""
    platforms = tuple(p.strip() for p in platforms if p.strip())
    if not platforms:
        raise ValueError("no lowering platforms given")
    if "tpu" in platforms and len(platforms) > 1:
        # the tpu artifact embeds Pallas kernels, which lower only for
        # tpu — a combined artifact would fail (or worse, silently ship
        # the slow XLA forward to the TPU fleet); export per platform
        raise ValueError("export 'tpu' separately from other platforms "
                         "(Pallas kernels lower only for tpu)")
    if symbolic:
        if pipeline != "cnn":
            raise ValueError("symbolic export supports pipeline='cnn' "
                             "only (filter kernels need static shapes)")
        scope = jax_export.SymbolicScope()
        b, h, w = jax_export.symbolic_shape("b, h, w", scope=scope)
        spec = jax.ShapeDtypeStruct((b, 3, h, w), jnp.uint8)
        fn = _pipeline_fn("cnn", False)
    else:
        spec = jax.ShapeDtypeStruct((batch, 3, height, width), jnp.uint8)
        fn = _pipeline_fn(pipeline, "tpu" in platforms)
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(spec)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_flagship(path: str):
    """Deserialize an exported artifact -> callable
    (uint8 [B,3,H,W] planar BGR -> reflectance [B,H,W] float32)."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return exp.call


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export the flagship reflectance forward as a "
                    "serving artifact (jax.export / StableHLO).")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--pipeline", default="cnn",
                   choices=("cnn", "bf", "gf"),
                   help="cnn = reflectance map; bf = BF(CNN,CNN) c20 "
                        "s22; gf = GF(CNN, image) r45 e3")
    p.add_argument("--symbolic", action="store_true",
                   help="one any-shape artifact (cnn only, XLA forward)")
    args = p.parse_args(argv)
    n = export_flagship(args.out, args.batch, args.height, args.width,
                        platforms=tuple(args.platforms.split(",")),
                        pipeline=args.pipeline, symbolic=args.symbolic)
    print("wrote", args.out, "({} bytes, platforms: {}, pipeline: {})"
          .format(n, args.platforms, args.pipeline))


if __name__ == "__main__":
    main()
