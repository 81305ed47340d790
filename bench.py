#!/usr/bin/env python
"""Benchmark: end-to-end reflectance pipeline throughput on one TPU chip.

Headline metric (BASELINE.json config 2/5): the paper's flagship filtered
result BF(CNN, CNN) as one fused device pipeline —
  sRGB uint8 batch -> linear -> reflectance CNN -> imwrite byte path
  (floor(r*255); sigmoid output never triggers the percentile normalize)
  -> joint bilateral (sigma_color=20,
  sigma_space=22, OpenCV semantics) -> WHDR against packed IIW-style
  comparisons —
measured in megapixels/second/chip.  Reference stack: 0.693 s per 0.37 MP
image = 0.5 MP/s (README.md:84-85, BASELINE.md).

Also reported inside the same JSON line: the GF(CNN, image) pipeline
(config 3) and the raw CNN decompose throughput (config 1).

Timing discipline: arrays are device-resident, the work loops run inside
one jitted fori_loop, and completion is forced by a host readback (the
axon tunnel's block_until_ready is not a reliable fence).
"""
import contextlib
import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


BATCH = 32
H = W = 256
MP = BATCH * H * W / 1e6
BASELINE_MPS = 0.5  # reference BF(CNN,CNN): ~0.37 MP / 0.693 s
K_COMPS = 1181  # real IIW blob row count (createNumpy...:83) — the WHDR
                # gather cost in the pipelines is the true metric workload


def _contained(name, thunk):
    """Run one bench stage; a failure (compile error, OOM) costs that
    stage's number, not the whole artifact.  Returns nan on failure —
    _r() turns it into JSON null."""
    try:
        return thunk()
    except Exception as err:  # noqa: BLE001 — report and carry on
        print("bench stage %s FAILED: %r" % (name, err), file=sys.stderr)
        return float("nan")


def _r(x, nd=2):
    """round() that maps non-finite stage results to JSON null."""
    return round(x, nd) if np.isfinite(x) else None


def _backend_ready():
    """Block until the accelerator backend answers, with a short bounded
    retry (VERDICT r3 item 2: a tunnel blip at startup must not crash
    bench before it can emit its JSON line).

    The probe runs in a SUBPROCESS with a hard timeout: with the axon
    tunnel down, jax.devices() does not raise — it HANGS inside the
    PJRT plugin's C init (measured 2026-08-18: >60 s, uninterruptible
    by SIGALRM because the block never returns to the interpreter).
    A killable child is the only reliable bounded probe.  Only after a
    probe succeeds does this process touch the backend itself.
    Retries/wait/timeout are env-tunable so the outage-simulation test
    stays fast."""
    import subprocess
    retries = max(int(os.environ.get("BENCH_INIT_RETRIES", "4")), 1)
    wait = float(os.environ.get("BENCH_INIT_WAIT", "30"))
    probe_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", "180"))
    # the probe must run an actual op, not just list devices: in the
    # DEGRADED tunnel mode (observed 2026-08-19) jax.devices() answers
    # instantly while every dispatch hangs — a devices()-only probe
    # passes and the bench then hangs uninterruptibly mid-_run
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.sum(jnp.ones((8, 128)))))")
    last = None
    for i in range(retries):
        try:
            subprocess.run([sys.executable, "-c", code], check=True,
                           timeout=probe_timeout, capture_output=True,
                           text=True)
            return
        except subprocess.TimeoutExpired:
            last = TimeoutError(
                "backend init probe hung >%gs (tunnel down?)"
                % probe_timeout)
        except subprocess.CalledProcessError as err:
            last = RuntimeError("backend init failed: %s"
                                % (err.stderr or "")[-300:])
        except Exception as err:  # noqa: BLE001
            last = err
        print("backend init attempt %d/%d failed: %r"
              % (i + 1, retries, last), file=sys.stderr)
        if i + 1 < retries:
            time.sleep(wait)
    raise last


_HEADLINE = ("BF(CNN,CNN) end-to-end megapixels/sec/chip "
             "(CNN+u8-write+joint-bilateral c20 s22+WHDR)")

_EMIT_LOCK = threading.Lock()
_FINAL_RC = [1]  # set by the normal exit paths before _emit_once


def _emit_once(record):
    """Exactly-one-JSON-line guard shared by the watchdog thread and the
    normal exit paths.  Timer.cancel() cannot stop a _fire that already
    started, so cancel+print alone can double-emit; Lock.acquire(False)
    is the atomic test-and-set — the first caller prints, the loser is
    a no-op.  Returns whether this caller won."""
    if _EMIT_LOCK.acquire(blocking=False):
        print(json.dumps(record), flush=True)
        return True
    return False


_SPREADS = {}


def _slope2(run, iters, tag=None):
    """Two-round slope timing with a spread record (VERDICT r4 item 5).

    One jit call through the axon tunnel carries a fixed ~29 ms RPC
    round-trip (measured 2026-08-17: T(n) is linear in n to <1% with
    intercept 29 ms), so (one call)/iters overstates small kernels by
    F/iters — 12% on the r2 bilateral headline, 28% on the 4K chain.
    Timing n and 3n iterations and taking the difference cancels the
    intercept exactly.  ``run(n)`` must execute n iterations and block.

    The value is the slope of the per-span minima (best-of-2 jitter
    guard, as before); additionally the two rounds' INDEPENDENT slope
    estimates' relative disagreement is recorded in _SPREADS[tag] (in
    percent) and reported in the bench JSON, so a reviewer can tell a
    few-percent regression from tunnel jitter round-over-round."""
    los, his = [], []
    for _ in range(2):
        t0 = time.time(); run(iters); los.append(time.time() - t0)
        t0 = time.time(); run(3 * iters); his.append(time.time() - t0)
    slope = (min(his) - min(los)) / (2 * iters)
    if tag is not None:
        per = [(h - l) / (2 * iters) for l, h in zip(los, his)]
        _SPREADS[tag] = round(
            100.0 * abs(per[0] - per[1]) / max(abs(slope), 1e-12), 1)
    return slope


def _timed_loop(fn, x, iters, tag=None):
    """Per-iteration device time of fn by the slope method (_slope2),
    with the work iterated inside one jitted fori_loop whose trip count
    is a dynamic argument (both spans share one compile)."""
    @jax.jit
    def loop(x0, n):
        def body(i, y):
            out = fn(y)
            return y + 1e-12 * out  # chain dependence, keep shape
        return jnp.sum(jax.lax.fori_loop(0, n, body, x0))
    float(loop(x, iters))  # compile + warm
    return _slope2(lambda n: float(loop(x, n)), iters, tag)


def run_gate():
    """On-chip parity gate (VERDICT r2 item 2): run golden inputs through
    the REAL dispatch users hit (Pallas/MXU kernels on the TPU backend)
    and require every uint8 output within 1 level of its anchor.

    Anchors:
      * guided: the committed independent C++-transcription fixtures
        (tests/fixtures/guided_golden.npz; see tests/guided_cpp_oracle.py)
        — exercises the MXU band-matmul path at r in {3,45,52} and the
        gray XLA path;
      * bilateral gray-self (the BF(CNN,CNN) -r.png case): the REAL
        cv2.bilateralFilter binary on the replicated-gray image — on a
        sin-grating study image AND a 1/f pink-noise image (the
        natural-image power spectrum; VERDICT r4 item 6);
      * CNN: an f64 numpy forward straight off the caffemodel blobs.

    Beyond pixel levels, the gate now measures the literal BASELINE.json
    fidelity criterion (VERDICT r4 item 1): for each gated pipeline it
    scores OUR output and the ORACLE output with the exact Bell WHDR
    (losses/whdr.py::whdr — math at /root/reference/training/layers/
    whdr_layer.py:253-287) against a deterministic synthetic IIW-style
    comparison blob (K=1181) and gates |dWHDR| <= 0.001 ("WHDR within
    0.1% absolute").  The APPROXIMATE grid quality point (ss=8, sr=6)
    is gated on WHDR only — its pixel error is by design ~1 u8 level,
    and the WHDR gate is what lets it clear BASELINE config 2's >=500
    MP/s target within the fidelity criterion.

    Returns (parity_ok, diffs): integer entries are max uint8 levels
    (gate <= 1), ``whdr_delta_*`` entries are |dWHDR| (gate <= 0.001).
    """
    import cv2
    from reflectance_filtering_tpu.ops.guided import guided_filter_u8
    from reflectance_filtering_tpu.ops.bilateral import (
        joint_bilateral_filter_u8)
    from reflectance_filtering_tpu.models.caffe_io import parse_caffemodel
    from reflectance_filtering_tpu.losses.whdr import whdr as whdr_exact
    from reflectance_filtering_tpu.utils.testimages import (
        make_synthetic_comps, pink_noise)

    diffs = {}

    # 40x the IIW per-image row count: at K=1181 a SINGLE flipped
    # comparison moves WHDR by ~0.085% — the same order as the 0.1%
    # criterion itself — so a 1181-row blob measures quantization, not
    # disagreement (measured: grid delta 0.0019 at K=1181 vs 1-4e-4 at
    # K>=11810).  The criterion is defined over the full IIW test set
    # (~1e5 comparisons); a 47k blob is the faithful estimator.
    _comps_dev = jax.device_put(make_synthetic_comps(11, 40 * K_COMPS))
    _score = jax.jit(lambda img: whdr_exact(img, _comps_dev))

    def _whdr_u8(img):
        # both sides of every delta go through this same path (uint8
        # levels / 255, channel order preserved), so the delta is pure
        # filter-output disagreement.  One jitted call per image shape;
        # the comps blob lives on the device once (per-call re-upload +
        # eager whdr dispatch cost seconds through the tunnel).
        a = np.asarray(img, np.float32) / 255.0
        if a.ndim == 2:
            a = a[..., None]
        return float(_score(jnp.asarray(a)))

    def _whdr_delta(key, ours, oracle):
        # gate on the RAW delta; round only the reported entry (rounding
        # before the compare would loosen the 0.1% criterion by up to
        # 5e-7 at the boundary); a failing delta is reported unrounded
        d = abs(_whdr_u8(ours) - _whdr_u8(oracle))
        diffs["whdr_delta_" + key] = d if d > 0.001 else round(d, 6)

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "guided_golden.npz")
    with np.load(fix) as z:
        g = {kk: z[kk] for kk in z.files}
    for tag, key, kind in [("r3_e3", "small", "color"),
                           ("r45_e3", "big", "color"),
                           ("r52_e7", "big", "color"),
                           ("r45_e3", "big", "colorsrc"),
                           ("r45_e3", "big", "gray")]:
        radius = int(tag.split("_")[0][1:])
        eps = float(tag.split("_e")[1])
        guide = g["img_{}_guide_{}".format(
            key, "gray" if kind == "gray" else "color")]
        src = (guide if kind == "colorsrc" else g["img_{}_src".format(key)])
        got = guided_filter_u8(guide, src, radius, eps)
        exp = g["out_{}_{}".format(tag, kind)]
        diffs["gf_{}_{}".format(tag, kind)] = int(
            np.abs(got.astype(np.int32) - exp.astype(np.int32)).max())
        if (tag, key, kind) == ("r45_e3", "big", "color"):
            _whdr_delta("gf_r45_e3", got, exp)  # the README c3 s45 combo

    # bilateral gray-self at the product sigmas (c20 s22) vs the cv2
    # BINARY — -r.png decodes to 3 identical channels, for which
    # bilateralFilter(joint==src) is the exact oracle
    rngg = np.random.RandomState(7)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    gray = np.clip(120 + 70 * np.sin(xx / 14.0) * np.cos(yy / 10.0)
                   + 12 * rngg.rand(96, 128), 0, 255).astype(np.uint8)

    # 1/f pink-noise class (natural-image power spectrum) — shared
    # generator with the grid quality-set test (utils/testimages.py)
    pink = pink_noise(rngg, 96, 128).astype(np.uint8)

    from reflectance_filtering_tpu.ops.bilateral_grid import (
        bilateral_grid_u8)
    for gname, gimg in (("cv2", gray), ("pink", pink)):
        rep3 = np.repeat(gimg[..., None], 3, axis=-1)
        got_bf = joint_bilateral_filter_u8(rep3, rep3, -1, 20.0, 22.0)
        exp_bf = cv2.bilateralFilter(rep3, -1, 20.0, 22.0)
        diffs["bf_gray_self_" + gname] = int(
            np.abs(got_bf.astype(np.int32) - exp_bf.astype(np.int32)).max())
        _whdr_delta("bf_" + gname, got_bf, exp_bf)
        # grid quality operating point (ss=8, sr=6): approximate mode,
        # gated on WHDR vs the cv2 oracle only (not pixel levels)
        got_grid = bilateral_grid_u8(rep3, rep3, 20.0, 22.0, ss=8, sr=6)
        _whdr_delta("grid_quality_" + gname, got_grid, exp_bf)

    # Band-tiled fused guided filter (the 4K/8K chain path) vs the
    # fixture-anchored whole-plane dispatch on the same input — the
    # committed fixtures can't cover every tiling, so gate the fused
    # kernels by consistency with the already-gated path, on-chip.
    # BOTH default tile classes: 480 rows resolves the tile rule to the
    # 240-row tiles the product 4K path uses (exact divide, off-128-grid
    # col blocks), 512 rows to the 256-row tiles the 8K path uses.
    from reflectance_filtering_tpu.ops.guided import guided_filter_planar
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _fused_geometry, guided_filter_fused_iterated)
    # pin the tile-class resolution (survives python -O, attributable):
    # 480 rows must resolve to the 240-row 4K-class tiles, 512 to the
    # 256-row 8K-class tiles, or the fused checks below test the wrong
    # product path
    for rows, want in ((480, 240), (512, 256)):
        got_rows = _fused_geometry(rows, 512, 45)[0]
        if got_rows != want:
            raise RuntimeError(
                "_fused_geometry(%d, 512, 45) resolved to %d-row tiles, "
                "expected %d — gate would test the wrong tile class"
                % (rows, got_rows, want))
    def interp_ctx():
        # one-shot context manager: build a fresh one per use
        if jax.default_backend() == "tpu":
            return contextlib.nullcontext()
        # CPU fallback drive (verify skill): interpret the kernels
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.force_tpu_interpret_mode()

    rngp = np.random.RandomState(3)
    for rows, key in ((480, "gf_fused_240row"), (512, "gf_fused_256row")):
        gp_ = jnp.asarray(np.floor(rngp.rand(1, 3, rows, 512) * 256)
                          .astype(np.float32))
        sp_ = jnp.asarray(np.floor(rngp.rand(1, 1, rows, 512) * 256)
                          .astype(np.float32))
        with interp_ctx():
            # TWO iterations so the apply kernel (iteration >= 2) runs
            anchor = np.floor(np.asarray(guided_filter_planar(
                gp_, guided_filter_planar(gp_, sp_, 45, 3.0),
                45, 3.0)))
            got_p = np.floor(np.asarray(guided_filter_fused_iterated(
                gp_, sp_, 45, 3.0, 2, guide_u8=True)))
            diffs[key] = int(np.abs(got_p - anchor).max())

    # CNN -r.png byte path vs f64 numpy forward off the caffemodel blobs
    from reflectance_filtering_tpu.cli.decompose import ReflectanceCNN
    img = np.clip(np.stack([gray, np.roll(gray, 7, 0),
                            np.roll(gray, 5, 1)], -1), 0, 255)
    net = ReflectanceCNN()
    got_r = np.floor(net.reflectance_intensity(img) * 255.0)
    raw = parse_caffemodel("/root/reference/learned_weights.caffemodel")
    x = img[:, :, ::-1].astype(np.float64) / 255.0
    x = np.where(x <= 0.04045, x / 12.92,
                 np.power((x + 0.055) / 1.055, 2.4))
    skips = []
    for i in range(5):
        wgt = raw["conv%d" % i][0][:, :, 0, 0]
        b = raw["conv%d" % i][1].reshape(-1)
        x = np.maximum(x @ wgt.T + b, 0.0)
        skips.append(x)
    cat = np.concatenate(skips, axis=-1)
    wf = raw["fuse_skip_layers"][0][:, :, 0, 0]
    bf = raw["fuse_skip_layers"][1].reshape(-1)
    exp_r = np.floor(
        (1.0 / (1.0 + np.exp(-(cat @ wf.T + bf))))[..., 0] * 255.0)
    diffs["cnn_r_png"] = int(np.abs(got_r - exp_r).max())
    _whdr_delta("cnn", got_r, exp_r)

    # the batched-production forward (fused Pallas kernel, planar feed —
    # what decompose_images runs on TPU) against the same f64 oracle
    from reflectance_filtering_tpu.cli.decompose import (
        _decompose_device_fused)
    with interp_ctx():
        got_rb = np.floor(np.asarray(_decompose_device_fused(
            net.packed,
            jnp.asarray(np.moveaxis(img[None], -1, 1).copy())))[0] * 255.0)
    diffs["cnn_r_png_batched"] = int(np.abs(got_rb - exp_r).max())

    ok = all((d <= 0.001 if k.startswith("whdr_delta_") else d <= 1)
             for k, d in diffs.items())
    return ok, diffs


def _run(profile_dir=None):
    """The benchmark proper.  Returns the result record (a dict); main()
    owns printing it so that a setup-time failure — backend init, weight
    load, device_put — still produces one parseable JSON line."""
    from reflectance_filtering_tpu.models.caffe_io import (
        load_reference_weights)
    from reflectance_filtering_tpu.models.networks import (
        reference_params_from_caffe)
    from reflectance_filtering_tpu.ops.cnn_pallas import (
        pack_weights, reflectance_cnn_pallas_planar)
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_gray_self_batched)
    from reflectance_filtering_tpu.ops.guided import guided_filter_planar
    from reflectance_filtering_tpu.losses.whdr import whdr_batch

    _SPREADS.clear()
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}

    rng = np.random.RandomState(0)
    # CHANNELS-FIRST batch: the pipelines consume planar layouts
    # everywhere (CNN kernel [3,T] blocks, GF guide [B,3,H,W], filtered
    # planes [B,1,H,W]), so a planar feed deletes every layout transpose
    # (measured 2026-08-19: GF pipeline 1.705 vs 1.780 ms HWC-fed).  The
    # product batch producers supply this for free — images are decoded
    # once host-side and device_put in whatever layout the pipeline
    # wants (np.moveaxis before the one-time transfer).
    imgs = jax.device_put(np.ascontiguousarray(np.moveaxis(
        rng.rand(BATCH, H, W, 3).astype(np.float32), -1, 1)))  # sRGB
    from reflectance_filtering_tpu.utils.testimages import (
        make_synthetic_comps)
    comps = jax.device_put(make_synthetic_comps(1, K_COMPS, batch=BATCH))

    def cnn_stage(x):
        # fused uint8-free path: sRGB [B,3,H,W] -> reflectance [B,H,W]
        return reflectance_cnn_pallas_planar(packed, x, srgb_input=True)

    def to_u8_scale(refl):
        # imwrite byte path (image_utils.py:60-73 + normalize :84-92):
        # normalize only divides by the 99.9th percentile when max > 1 —
        # sigmoid reflectance is always < 1, so the shipped CLI writes
        # floor(r*255) unnormalized.  Mirror that exactly.
        return jnp.floor(refl * 255.0)

    def bf_pipeline(x):
        refl = cnn_stage(x)
        r_u8 = to_u8_scale(refl)
        # -r.png is grayscale; imread replicates channels -> the gray
        # self-guided kernel is exact for BF(CNN,CNN)
        filt = bilateral_gray_self_batched(r_u8, -1, 20.0, 22.0)
        filt_hwc = (filt / 255.0)[..., None]
        score = whdr_batch(filt_hwc, comps)
        return x + 1e-12 * (score + jnp.sum(filt) * 0)

    def gf_pipeline(x):
        refl = cnn_stage(x)
        r_u8 = to_u8_scale(refl)
        # -r.png replicates gray to 3 channels; GF treats src channels
        # independently, so filtering one channel is exact.  The guide
        # is the planar input itself; moveaxis on the 1-channel output
        # is a free unit-axis reshape.
        guide = jnp.floor(x * 255.0)
        filt = guided_filter_planar(guide, r_u8[:, None], 45, 3.0)
        filt_hwc = jnp.moveaxis(filt, 1, -1) / 255.0
        score = whdr_batch(filt_hwc, comps)
        return x + 1e-12 * (score + jnp.sum(filt) * 0)

    def cnn_only(x):
        refl = cnn_stage(x)
        return x + 1e-12 * jnp.sum(refl)

    t_cnn = _contained("cnn",
                       lambda: _timed_loop(cnn_only, imgs, 50, "cnn"))
    t_gf = _contained("gf_pipeline",
                      lambda: _timed_loop(gf_pipeline, imgs, 40,
                                          "gf_pipeline"))
    t_bf = _contained("bf_pipeline",
                      lambda: _timed_loop(bf_pipeline, imgs, 8,
                                          "bf_pipeline"))

    if profile_dir:
        # --profile <dir>: XLA-level trace of one BF and one GF pipeline
        # step (view with xprof / tensorboard --logdir)
        from reflectance_filtering_tpu.utils.profiling import device_trace
        with device_trace(profile_dir):
            float(jnp.sum(bf_pipeline(imgs)))
            float(jnp.sum(gf_pipeline(imgs)))
        print("wrote device trace to", profile_dir, file=sys.stderr)

    # color self-guided bilateral (cv2.bilateralFilter semantics on the
    # photo itself — the CLI's joint==src color path)
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_color_self_batched)
    imgs_u8p = jax.device_put(np.floor(
        rng.rand(8, 3, H, W) * 256).astype(np.float32))

    def bf_color_self(x):
        out = bilateral_color_self_batched(x, -1, 20.0, 22.0)
        return x * (1.0 + 1e-12 * jnp.sum(out[:, :, 0, :2]))

    t_bfc = _contained("bf_color_self",
                       lambda: _timed_loop(bf_color_self, imgs_u8p, 4,
                                           "bf_color_self"))
    bfc_mps = (8 * H * W / 1e6) / t_bfc

    # joint != src: BF(reflectance, color photo) — the CLI's 'filter the
    # -r map guided by the original photo' case (filter_reflectance.py
    # guidance_in contract); mono src + color joint = 2 mantissa-packed
    # rolls/tap
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_packed_joint_batched)
    refl_u8p = jax.device_put(np.floor(
        rng.rand(8, 1, H, W) * 256).astype(np.float32))

    def bf_joint_photo(x):
        out = bilateral_packed_joint_batched(imgs_u8p, x, -1, 20.0, 22.0)
        return x * (1.0 + 1e-12 * jnp.sum(out[:, :, 0, :2]))

    t_bfj = _contained("bf_joint_photo",
                       lambda: _timed_loop(bf_joint_photo, refl_u8p, 4,
                                           "bf_joint_photo"))
    bfj_mps = (8 * H * W / 1e6) / t_bfj

    # OPTIONAL approximate fast mode (bilateral grid; p99 error ~2 u8
    # levels vs exact — NOT the parity path, reported for context)
    from reflectance_filtering_tpu.ops.bilateral_grid import (
        bilateral_grid_gray)
    gj = jax.device_put(np.floor(rng.rand(BATCH, H, W) * 256)
                        .astype(np.float32))
    gs = jax.device_put(np.floor(rng.rand(BATCH, 1, H, W) * 256)
                        .astype(np.float32))

    def bf_grid(x):
        out = bilateral_grid_gray(x, gs, 20.0 / 3.0, 22.0)
        return x * (1.0 + 1e-12 * out[0, 0, 0, 0])

    t_grid = _contained("bf_grid",
                        lambda: _timed_loop(bf_grid, gj, 20, "bf_grid"))
    grid_mps = MP / t_grid

    # tuned fast operating point (ss=16, sr=1.5 sigma): measured v5e
    # 689 MP/s; on the quality study image mean err 0.50 / p99 2 /
    # max 4 u8 levels vs exact (sweep: /tmp/grid_sweep.py, 2026-08-17;
    # ss must divide the image — 256/12 padded to 264 broke the pow-2
    # pooling layout and made the old ss=12 point SLOWER than default)
    def bf_grid_fast(x):
        out = bilateral_grid_gray(x, gs, 20.0 / 3.0, 22.0, ss=16, sr=10)
        return x * (1.0 + 1e-12 * out[0, 0, 0, 0])

    t_gridf = _contained("bf_grid_fast",
                         lambda: _timed_loop(bf_grid_fast, gj, 20,
                                             "bf_grid_fast"))
    gridf_mps = MP / t_gridf

    # quality operating point (ss=8, sr=6): the finest grid that still
    # clears 500 MP/s — p99 error 1 u8 level on every image of the
    # 5-class quality set (max 3 on the hard-edge study image; sweep
    # /tmp/grid_sweep2.py + /tmp/grid_quality.py, 2026-08-17)
    def bf_grid_quality(x):
        out = bilateral_grid_gray(x, gs, 20.0 / 3.0, 22.0, ss=8, sr=6)
        return x * (1.0 + 1e-12 * out[0, 0, 0, 0])

    t_gridq = _contained("bf_grid_quality",
                         lambda: _timed_loop(bf_grid_quality, gj, 20,
                                             "bf_grid_quality"))
    gridq_mps = MP / t_gridq

    # config 4: 3x iterated GF chain (Zoran-style) on one 4K frame.
    # u8-valued frames (what a decoded video frame actually is) let the
    # chain store its guide windows in bf16 — bitwise identical, half
    # the guide HBM traffic (guide_u8=True below).
    from reflectance_filtering_tpu.ops.guided import guided_filter_iterated
    h4k, w4k = 2160, 3840
    g4k = jax.device_put(np.floor(rng.rand(1, 3, h4k, w4k) * 256)
                         .astype(np.float32))
    s4k = jax.device_put(np.floor(rng.rand(1, 1, h4k, w4k) * 256)
                         .astype(np.float32))
    reps = 8

    @jax.jit
    def chain_many(g, s, n):
        # anti-hoist: the guide must change per rep or XLA amortizes the
        # guide statistics across reps.  A single-element in-place update
        # on the loop-carried buffer does that without the ~1.9 ms
        # full-frame elementwise pass a whole-guide multiply cost (XLA
        # runs 95 MB elementwise at only ~120 GB/s) — the measured chain
        # is now the product work, not the benchmark scaffolding.
        def body(i, carry):
            g, acc = carry
            g = g.at[0, 0, 0, 0].mul(1.0 + 1e-12 * acc)
            out = guided_filter_iterated(g, s, 45, 3.0, 3, planar=True,
                                         guide_u8=True)
            return g, acc + out[0, 0, 0, 0] * 1e-9
        return jax.lax.fori_loop(0, n, body,
                                 (g, jnp.float32(0.0)))[1]

    def _time_4k():
        float(chain_many(g4k, s4k, reps))  # compile+warm
        return _slope2(lambda n: float(chain_many(g4k, s4k, n)),
                       reps, "gf_3x_4k")

    t_4k = _contained("gf_3x_4k", _time_4k)

    # config 4b: the same 3x chain on one 8K frame — the resolution
    # where the u8 big-frame dispatch used to crash (fixed aef6c4f), so
    # the driver artifact pins it (VERDICT r3 item 4).  Product dispatch
    # only; the frame + chain intermediates are ~1.6 GB so the inputs
    # are created inside the containment and freed right after.
    h8k, w8k = 4320, 7680
    reps8 = 4

    def _time_8k():
        g8k = s8k = None
        try:
            g8k = jax.device_put(np.floor(
                rng.rand(1, 3, h8k, w8k) * 256).astype(np.float32))
            s8k = jax.device_put(np.floor(
                rng.rand(1, 1, h8k, w8k) * 256).astype(np.float32))
            float(chain_many(g8k, s8k, reps8))  # compile+warm
            return _slope2(lambda n: float(chain_many(g8k, s8k, n)),
                           reps8, "gf_3x_8k")
        finally:
            # device_put itself may fail (OOM): free whatever landed so
            # a contained 8K failure cannot leak ~380 MB into the
            # training stage
            for buf in (g8k, s8k):
                if buf is not None:
                    buf.delete()

    t_8k = _contained("gf_3x_8k", _time_8k)

    # training: one fused fwd+autodiff-bwd+adam step, reference batch 20
    from reflectance_filtering_tpu.models.networks import (
        NetworkConfig, init_network)
    from reflectance_filtering_tpu.train.loop import (
        LossConfig, compute_losses, make_optimizer)
    import optax
    tcfg = NetworkConfig()
    tl = LossConfig()
    tparams = init_network(jax.random.PRNGKey(0), tcfg)
    topt = make_optimizer("ADAM", 1e-3)
    tstate = topt.init(tparams)
    tb = 20
    timgs = jax.device_put(rng.rand(tb, H, W, 3).astype(np.float32))
    tcomps = jax.device_put(np.broadcast_to(
        np.asarray(comps)[:1], (tb,) + comps.shape[1:]).copy())
    titers = 40

    @jax.jit
    def train_many(p0, o0, im, c, n):
        def body(i, carry):
            p, o = carry
            (_, m), g = jax.value_and_grad(
                lambda pp: compute_losses(pp, im, c, tcfg, tl,
                                          jax.random.PRNGKey(0),
                                          train=True),
                has_aux=True)(p)
            up, o = topt.update(g, o, p)
            return optax.apply_updates(p, up), o
        return jax.lax.fori_loop(0, n, body, (p0, o0))

    def _run_train(n):
        tp, to = train_many(tparams, tstate, timgs, tcomps, n)
        float(jnp.sum(jax.tree_util.tree_leaves(tp)[0]))

    def _time_train():
        _run_train(titers)  # compile+warm
        return _slope2(_run_train, titers, "train_step")

    t_train = _contained("train_step", _time_train)

    bf_mps = MP / t_bf
    gf_mps = MP / t_gf
    cnn_mps = MP / t_cnn

    # experimental stages and the gate run LAST so a hung kernel can
    # only cost their own numbers; SIGALRM bounds the hang itself
    # (without it a hang would lose the whole JSON line, since bench
    # prints only at the end)
    import signal

    def _alarmed(name, thunk, seconds):
        def run():
            if not hasattr(signal, "SIGALRM"):
                return thunk()

            def _alarm(signum, frame):
                raise TimeoutError(name + " timeout")

            old_h = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(seconds)
            try:
                return thunk()
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old_h)
        return run

    # on-chip parity bit: the golden gallery through the real TPU
    # dispatch (VERDICT r2 item 2) — a gate failure must not lose the
    # throughput numbers, so contain and report.  1800 s covers a
    # post-tunnel-recovery cold-compile backlog (a single CLI run has
    # taken >300 s there; the gate compiles ~8 distinct kernels).
    try:
        parity_ok, parity_diffs = _alarmed("gate", run_gate, 1800)()
    except Exception as err:  # fixture missing, compile failure, hang
        parity_ok, parity_diffs = False, {"error": repr(err)[:500]}

    # the literal BASELINE.json fidelity criterion, surfaced as its own
    # field: max |dWHDR| across all gated pipelines (None if the gate
    # errored before scoring)
    _wd = [v for k, v in parity_diffs.items()
           if k.startswith("whdr_delta_") and isinstance(v, float)]
    whdr_delta_max = max(_wd) if _wd else None

    return {
        "metric": _HEADLINE,
        "value": _r(bf_mps),
        "unit": "MP/s/chip",
        "vs_baseline": _r(bf_mps / BASELINE_MPS, 1),
        "gf_pipeline_mps": _r(gf_mps),
        "cnn_decompose_mps": _r(cnn_mps),
        "bf_color_self_mps": _r(bfc_mps),
        "bf_joint_photo_mps": _r(bfj_mps),
        "bf_grid_approx_mps": _r(grid_mps),
        "bf_grid_fast_mps": _r(gridf_mps),
        "bf_grid_quality_mps": _r(gridq_mps),
        "gf_3x_4k_mps": _r(h4k * w4k / t_4k / 1e6),
        "gf_3x_8k_mps": _r(h8k * w8k / t_8k / 1e6),
        "train_imgs_per_s": _r(tb / t_train, 1),
        "batch": BATCH, "resolution": [H, W],
        "whdr_comparisons_per_image": K_COMPS,
        # per-stage relative disagreement (%) between the two rounds'
        # independent slope estimates — the jitter floor a regression
        # must clear to be real (VERDICT r4 item 5)
        "timing_spread_pct": dict(_SPREADS),
        "parity_ok": parity_ok,
        "parity_max_diffs": parity_diffs,
        "whdr_delta_max": whdr_delta_max,
    }


def _arm_watchdog(record=None):
    """Last-resort hang bound: if the bench has not finished after
    BENCH_DEADLINE seconds, print the error JSON and hard-exit.

    A tunnel that degrades MID-RUN (ops hang inside the PJRT C dispatch,
    where neither SIGALRM nor exceptions can reach — the jax.devices()
    hang note in _backend_ready applies to every op) would otherwise
    hang bench forever and the driver would capture no artifact at all.
    A daemon Timer THREAD still runs while the main thread is blocked in
    C, so it can always emit the JSON line and os._exit.  Returns the
    timer (cancel it on success) or None when disabled.

    Runs before main()'s try block, so it must never raise — a malformed
    BENCH_DEADLINE falls back to the default instead of crashing bench
    without its JSON line."""
    try:
        deadline = float(os.environ.get("BENCH_DEADLINE", "5400"))
    except ValueError as err:
        print("bad BENCH_DEADLINE, using 5400: %r" % err, file=sys.stderr)
        deadline = 5400.0
    if deadline <= 0:
        return None

    def _fire():
        err = ("bench watchdog: no result after %gs "
               "(op hung through the tunnel?)" % deadline)
        if record is not None:
            rec = dict(record)
            if "parity_max_diffs" in rec:
                # gate error contract: the reason lives INSIDE
                # parity_max_diffs (what --gate consumers are tested on)
                rec["parity_max_diffs"] = {"error": err}
            else:
                rec["error"] = err
        else:
            rec = {"metric": _HEADLINE, "value": None,
                   "unit": "MP/s/chip", "vs_baseline": None,
                   "parity_ok": False, "error": err}
        if _emit_once(rec):
            sys.stdout.flush()
            os._exit(1)
        # Lost the emit race: the normal path printed (or is printing)
        # its record, so do NOT print — but the watchdog's other job
        # stands: bound the EXIT.  Interpreter/PJRT teardown through a
        # degraded tunnel can hang in C after the record is out; give
        # the winner's flush a moment, then hard-exit with its rc.
        time.sleep(10)
        os._exit(_FINAL_RC[0])

    t = threading.Timer(deadline, _fire)
    t.daemon = True
    t.start()
    return t


def main(profile_dir=None):
    """Outage-proof driver entry: ALWAYS prints exactly one JSON line.

    An unrecoverable setup failure (backend init after bounded retries,
    weight load, device_put of the shared inputs) yields the headline
    record with null metrics and an "error" field, then rc=1 — a tunnel
    blip must never again produce an artifact with no parseable JSON
    (BENCH_r03.json).  Per-stage failures inside _run stay contained as
    nulls with rc=0; a mid-run HANG is bounded by _arm_watchdog."""
    dog = _arm_watchdog()
    try:
        _backend_ready()
        record = _run(profile_dir)
        rc = 0
    except BaseException as err:  # incl. KeyboardInterrupt/SystemExit:
        # partial runs must still leave a parseable artifact
        record = {"metric": _HEADLINE, "value": None,
                  "unit": "MP/s/chip", "vs_baseline": None,
                  "parity_ok": False,
                  "error": repr(err)[:500]}
        rc = 1
    if dog is not None:
        dog.cancel()
    _FINAL_RC[0] = rc
    _emit_once(record)
    return rc


if __name__ == "__main__":
    if "--gate" in sys.argv:
        dog = _arm_watchdog({"parity_ok": False, "parity_max_diffs": {}})
        try:
            _backend_ready()
            ok, d = run_gate()
        except BaseException as err:  # noqa: BLE001
            ok, d = False, {"error": repr(err)[:500]}
        if dog is not None:
            dog.cancel()
        _FINAL_RC[0] = 0 if ok else 1
        _emit_once({"parity_ok": ok, "parity_max_diffs": d})
        sys.exit(0 if ok else 1)
    prof = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        prof = (sys.argv[i + 1] if i + 1 < len(sys.argv)
                else "/tmp/reflectance_trace")
    sys.exit(main(profile_dir=prof))
