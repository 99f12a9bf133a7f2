"""Headline benchmark body — see repo-root bench.py for the driver
entry point and metric definition.

Reports throughput (tracked frames/s/chip), the analytic model FLOPs per
frame, achieved TFLOP/s and MFU against the chip's bf16 peak, and two
latency numbers: `pipelined_frame_ms_b1` (the steady-state per-frame device
time — the NAMED latency metric) and `p50_roundtrip_ms_b1` (includes the
host<->device link, which on a tunneled dev chip is network-dominated).
"""


import json
import time

import numpy as np

# Wall-clock held back from the bench budget for the TRACK accuracy
# artifact. Measured r5 (weights-as-arguments refactor: per-core train
# compiles fell from ~190s to seconds): the full artifact including the
# scale-head stage runs 348-575s cold and ~330s warm. 620s keeps margin
# for a degraded tunnel window while leaving spare for the baked-headline
# child; the artifact itself also stops training early (with the
# 200-step fidelity floor) when the deadline nears, so the reserve is a
# floor, not a promise.
_TRACK_RESERVE_S = 620.0

# Regression tripwire vs the previous round's driver-recorded bench
# (BENCH_r{N-1}.json): if any field BOTH rounds measured drops more than
# this fraction, bench exits nonzero AFTER printing the JSON line and
# finishing the TRACK artifact — a silent 2x throughput loss must not be
# rc=0 (VERDICT r4 weak #2). 15% clears the measured round-to-round
# tunnel noise on the best-of-3 headline (r3->r4: +0.7%) by ~20x.
_REGRESSION_FRAC = 0.15

# higher-is-better fields the tripwire compares when both rounds have them
_TRIPWIRE_FIELDS = (
    "value",
    "mfu",
    "frames_per_sec_weights_as_args",
    "device_loop_frames_per_sec",
    "train_frames_per_sec_cached",
    "train_mfu",
)

# value/mfu depend on the headline variant (weights baked as constants
# compile a ~14% faster conv schedule than weights-as-arguments; records
# before r5 were implicitly baked) — comparing across variants would
# flag a measurement-mode difference as a perf regression
_VARIANT_DEPENDENT = ("value", "mfu")


def _latest_bench_record(root: str):
    """(round_n, path) of the newest BENCH_r*.json the driver left at the
    repo root, or (0, None) — THE round-numbering scan, shared by the
    regression tripwire and the TRACK artifact's round derivation."""
    import glob
    import os
    import re

    best_n, best_path = 0, None
    for f in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m and int(m.group(1)) > best_n:
            best_n, best_path = int(m.group(1)), f
    return best_n, best_path


def _previous_bench_metrics(root: str):
    """(round_n, metrics) from the newest BENCH_r*.json, or (None, None).
    The driver records {"parsed": {...}} when the JSON line survived its
    tail window; otherwise the line is embedded (possibly head-truncated)
    in "tail" and the fields are recovered by regex."""
    import re

    best_n, best_path = _latest_bench_record(root)
    if best_path is None:
        return None, None
    try:
        with open(best_path) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None, None
    parsed = rec.get("parsed")
    if isinstance(parsed, dict):
        return best_n, parsed
    tail = rec.get("tail") or ""
    metrics = {}
    for key in _TRIPWIRE_FIELDS:
        hits = re.findall(
            rf'"{key}": (null|-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)', tail)
        if hits and hits[-1] != "null":
            try:
                metrics[key] = float(hits[-1])
            except ValueError:
                pass
    variant = re.findall(r'"headline_variant": "([a-z-]+)"', tail)
    if variant:
        metrics["headline_variant"] = variant[-1]
    return best_n, metrics


def _bench_regressions(result: dict, prev: dict,
                       frac: float = _REGRESSION_FRAC) -> list:
    """[(field, prev, cur), ...] where a field both rounds measured
    dropped by more than `frac` (all tripwire fields are
    higher-is-better)."""
    out = []
    for key in _TRIPWIRE_FIELDS:
        p, c = prev.get(key), result.get(key)
        if p is None or c is None:
            continue
        if p > 0 and c < p * (1.0 - frac):
            out.append((key, p, c))
    return out


# bf16 peak TFLOP/s by device_kind substring (public spec sheets)
_PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,   # TPU v5e
    "v5e": 197.0,
    "v4": 275.0,
    "v5p": 459.0,
    "v6 lite": 918.0,   # Trillium
}


def _chip_peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16_TFLOPS.items():
        if key in kind:
            return peak
    return None


def frame_flops(cfg) -> float:
    """Analytic FLOPs of one tracked frame: VGG conv1..conv4_3 on the
    crop_size^2 crop + tokens_per_frame NTM cell steps (matmul terms; the
    elementwise/addressing tail is <1%). Accounts for the fast conv4 path
    (vgg16_conv43_tokens: conv4 runs VALID on the token grid's 21x21
    receptive-field patch -> 19/17/15 output sides instead of 28)."""
    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX

    fast = (
        getattr(cfg, "fast_conv43", False)
        and cfg.feature_points is None
        and cfg.data.crop_size == 224
    )
    fast_sides = {
        "conv1/conv1_1": 202, "conv1/conv1_2": 200,
        "conv2/conv2_1": 98, "conv2/conv2_2": 96,
        "conv3/conv3_1": 46, "conv3/conv3_2": 44, "conv3/conv3_3": 42,
        "conv4/conv4_1": 19, "conv4/conv4_2": 17, "conv4/conv4_3": 15,
    }
    total = 0.0
    hw = cfg.data.crop_size
    in_ch = 3
    for name, out_ch, has_pool in VGG16_PREFIX:
        side = fast_sides[name] if fast and name in fast_sides else hw
        total += 2.0 * side * side * 9 * in_ch * out_ch  # 3x3 conv MACs x2
        in_ch = out_ch
        if name == "conv4/conv4_3":
            break
        if has_pool:
            hw //= 2

    n = cfg.ntm
    ctrl_in = cfg.input_depth + n.read_head_size * n.mem_dim
    hidden = n.controller_hidden_size
    per_step = 0.0
    ins = [ctrl_in] + [hidden] * (n.controller_num_layers - 1)
    for d in ins:
        per_step += 2.0 * (d + hidden) * 4 * hidden  # LSTM gates
    from ntm_tracker_tpu.models.ntm_cell import head_param_sizes

    P = sum(head_param_sizes(n).values())
    per_step += 2.0 * hidden * P                      # fused head unpack
    per_step += 2.0 * hidden * n.output_dim           # output head
    # addressing: cosine + conv + erase/add + read, all O(H*N*D)-ish
    per_step += 2.0 * n.num_heads * n.mem_size * n.mem_dim * 4
    total += cfg.tokens_per_frame * per_step
    return total


def _headline_setup():
    """The headline benchmark's model construction — ONE site, shared
    with the baked-compile child process so both build byte-identical
    programs (fixed PRNG seeds => identical baked constants => the same
    persistent-cache key)."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params

    cfg = TrackerConfig(core="ntm", compute_dtype=jnp.bfloat16,
                        train=TrainConfig(batch_size=1, sequence_length=20))
    core = make_core(cfg)
    vgg_params = init_vgg_params(jax.random.PRNGKey(0))
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
    return cfg, core, vgg_params, params


def compile_baked_headline(B: int) -> None:
    """Child-process entry: compile (into the shared persistent cache)
    the constant-baked headline frame step at batch B and execute one
    step. Run in a child so a slow constant-folding compile can be
    abandoned by timeout without wedging the bench process."""
    import jax.numpy as jnp

    from ntm_tracker_tpu.tracking.tracker import build_frame_step
    from ntm_tracker_tpu.utils.compcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    cfg, core, vgg_params, params = _headline_setup()
    _, step = build_frame_step(cfg, core, vgg_params, params,
                               donate_state=True, bake_weights=True)
    crops = jnp.zeros((B, 224, 224, 3), jnp.float32)
    state = core.init_state(params, B)
    off, _ = step(crops, state)
    np.asarray(off)
    print("BAKED_OK", flush=True)


def _warm_baked_headline(B: int, timeout_s: float) -> bool:
    """True if the baked headline program is compiled and cached (child
    exits OK within timeout_s — seconds when the committed cache hits,
    up to the timeout for a genuine cold constant-folding compile)."""
    import subprocess
    import sys

    if timeout_s < 60:
        return False
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "from ntm_tracker_tpu.benchmarks import compile_baked_headline;"
             f" compile_baked_headline({B})"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return p.returncode == 0 and "BAKED_OK" in p.stdout


def main(deadline: float | None = None):
    import os
    import sys

    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.tracking.tracker import build_frame_step

    # Wall-clock budget (round-3 lesson: the driver killed bench at rc=124,
    # truncating the accuracy artifact). Secondary phases are gated on the
    # remaining budget with _TRACK_RESERVE_S held back for the TRACK
    # artifact, and the artifact's own training loop adapts to the deadline
    # — the whole evidence chain must finish with rc=0.
    if deadline is None:
        deadline = time.time() + float(
            os.environ.get("NTM_BENCH_BUDGET_S", "1500"))

    def remaining() -> float:
        return deadline - time.time()

    skipped: list = []

    def gate(name: str, est_s: float) -> bool:
        """True if phase `name` (estimated est_s) fits without eating the
        TRACK reserve; logs + records the skip otherwise."""
        if remaining() > est_s + _TRACK_RESERVE_S:
            return True
        print(f"bench: budget: skipping {name} "
              f"(remaining {remaining():.0f}s < est {est_s:.0f}s + "
              f"track reserve {_TRACK_RESERVE_S:.0f}s)", file=sys.stderr)
        skipped.append(name)
        return False

    t_phase = time.time()

    def phase_done(name: str) -> None:
        nonlocal t_phase
        now = time.time()
        print(f"bench: phase {name}: {now - t_phase:.1f}s "
              f"(remaining {deadline - now:.0f}s)", file=sys.stderr)
        t_phase = now

    dev = jax.devices()[0]
    platform = dev.platform

    cfg, core, vgg_params, params = _headline_setup()

    rng = np.random.RandomState(0)

    def bench_batch(B, iters, warmup=3, cfg_use=None, bake_weights=False):
        _, step_rest = build_frame_step(
            cfg_use or cfg, core, vgg_params, params, donate_state=True,
            bake_weights=bake_weights,
        )
        # bound the host transient: rng.rand at the sweep's B=4096 ceiling
        # would allocate ~4.9 GB of float64 scratch; tile a 64-sample block
        # instead (identical tiles don't change the per-frame conv cost)
        nb = min(B, 64)
        block = rng.rand(nb, 224, 224, 3).astype(np.float32) * 150 - 75
        if B > nb:
            block = np.tile(block, (-(-B // nb), 1, 1, 1))[:B]
        crops = jnp.asarray(block)
        state = core.init_state(params, B)
        # warmup (compile)
        for _ in range(warmup):
            offsets, state = step_rest(crops, state)
        np.asarray(offsets)  # value fetch = hard sync (see below)
        # best of 3 passes: a single pass is hostage to one bad window on
        # the tunneled link (observed 2.5x swings between identical runs)
        best_dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                offsets, state = step_rest(crops, state)
            # fetch a value rather than block_until_ready: on the tunneled
            # dev backend block_until_ready has been observed to return
            # before the enqueued chain finishes, inflating throughput
            np.asarray(offsets)
            best_dt = min(best_dt, time.perf_counter() - t0)
        dt = best_dt
        return B * iters / dt, dt / iters

    # throughput at large batch (many concurrent tracks per chip),
    # sweeping until the knee (<3% gain from doubling)
    lat_p10 = lat_p90 = float("nan")
    lat_n = 0
    device_ms_med = float("nan")
    if platform == "cpu":  # CI smoke: tiny sizes
        throughput, _ = bench_batch(B=4, iters=3, warmup=1)
        best_batch = 4
        lat_ms = float("nan")
        device_ms = float("nan")
    else:
        best, best_batch = 0.0, 0
        B = 128
        while B <= 4096:
            fps, _ = bench_batch(B, iters=20)
            if fps > best * 1.03:
                best, best_batch = fps, B
                B *= 2
            else:
                break
            # deadline-aware sweep (r5: one degraded tunnel window cost a
            # single sweep 1811s and starved everything downstream) —
            # best-so-far stands, the TRACK reserve survives
            if remaining() < _TRACK_RESERVE_S + 250:
                print(f"bench: budget: stopping the batch sweep at B="
                      f"{best_batch} (remaining {remaining():.0f}s)",
                      file=sys.stderr)
                break
        throughput = best
        phase_done("headline_sweep")
        # single-stream tracking latency at B=1, with dispersion: the
        # roundtrip is tunnel-dominated on a dev chip and r2->r3 moved
        # 28.2->35.5 ms with no code change suspect — p10/p50/p90 + n make
        # link noise and code regressions distinguishable
        _, step_rest = build_frame_step(
            cfg, core, vgg_params, params, donate_state=True
        )
        crop1 = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
        state = core.init_state(params, 1)
        _, state = step_rest(crop1, state)  # compile
        lats = []
        for _ in range(50):
            t0 = time.perf_counter()
            offsets, state = step_rest(crop1, state)
            np.asarray(offsets)
            lats.append(time.perf_counter() - t0)
        lat_p10, lat_ms, lat_p90 = (
            float(np.percentile(lats, q) * 1e3) for q in (10, 50, 90))
        lat_n = len(lats)
        # steady-state pipelined device time: best-of-3 passes headline
        # (tunnel-variance rationale above) + the median pass for spread
        pass_ms = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50):
                offsets, state = step_rest(crop1, state)
            np.asarray(offsets)
            pass_ms.append((time.perf_counter() - t0) / 50 * 1e3)
        device_ms = min(pass_ms)
        device_ms_med = float(np.median(pass_ms))
        phase_done("latency_b1")

    # secondary metric: training throughput from the feature cache
    # (train-offsets --feature_cache; the 1300-step BPTT without the VGG).
    # Cheapest secondary phase, so it runs first under the budget gates.
    train_fps = train_ms = None
    train_shape = (256, 20)  # measured knee; ONE site for measure + FLOPs
    # est 150: measured 103-119s in r5's COLD rehearsals (the fused-BPTT
    # Mosaic compile is the only nontrivial piece and it caches well)
    if platform != "cpu" and gate("cached_train", 150):
        try:
            train_fps, train_ms = _cached_train_throughput(*train_shape)
        except Exception as e:  # never let the secondary metric kill bench
            print(f"bench: cached-train measurement skipped: {e}",
                  file=sys.stderr)
        phase_done("cached_train")

    # secondary metric: the fully device-resident closed loop (crop
    # geometry + VGG + cell steps + recrop feedback in ONE program,
    # make_device_track_step) at the headline's best batch — the true
    # end-to-end number for uniform-frame fleet serving, raw 360x640
    # frames in, pixel regions out
    devloop_fps = None
    if platform != "cpu" and gate("device_loop", 60):  # r5 measured 25-47s
        try:
            devloop_fps = _device_loop_throughput(
                cfg, core, vgg_params, params, best_batch)
        except Exception as e:  # never let the secondary metric kill bench
            print(f"bench: device-loop measurement skipped: {e}",
                  file=sys.stderr)
        phase_done("device_loop")

    # headline at BAKED weights: the sweep above runs weights-as-args
    # programs (compiles in seconds — they share the persistent-cache
    # entries every other stage uses), then the winning batch is
    # re-measured ONCE with the weights compiled in as constants, which
    # XLA turns into a ~14% faster conv schedule (r5 A/B: 32.06 vs
    # 36.61 ms/step at B=256; neither bf16 pre-casting the weights nor
    # device_put into the executable's preferred input layouts recovers
    # it). Production serving gets the baked program via the AOT export,
    # so the baked number is the honest headline; the args number rides
    # alongside. The expensive part — the ~10-min COLD constant-folding
    # compile — runs in a CHILD process bounded by whatever budget is
    # spare beyond the TRACK reserve: with the committed warm cache the
    # child is a seconds-scale hit; a cold slow window gets abandoned at
    # the timeout and the args number stands (variant field says which).
    # Window economics (measured r5): the baked program costs 2.5-8+ min
    # of TUNNEL time whether compiling or loading the committed 71 MB
    # cache entry (8m20s observed in a degraded window at 4.5s of CPU) —
    # so the child lands in good windows and is abandoned in bad ones;
    # either way TRACK keeps its reserve. Re-measuring ONLY best_batch is
    # sound: the knee is variant-independent (r5 probe: baked B=512 is
    # 8031.5 f/s vs 7981.3 at the args-swept B=256 knee — +0.6%, under
    # the sweep's own 3% threshold).
    headline_variant = "weights-as-args"
    throughput_args = throughput
    if platform != "cpu":
        spare = remaining() - _TRACK_RESERVE_S - 180  # parent re-measure
        budget = min(500.0, spare)
        # the parent's own re-measure must RE-gate on what the child left:
        # loading the baked program costs tunnel time too, and overrunning
        # here would eat the TRACK reserve — the exact failure it guards
        if (_warm_baked_headline(best_batch, budget)
                and remaining() - _TRACK_RESERVE_S > 120):
            try:
                baked_fps, _ = bench_batch(best_batch, iters=20,
                                           bake_weights=True)
                if baked_fps >= throughput_args:
                    headline_variant = "baked-constants"
                    throughput = baked_fps
                else:
                    # a degraded window can measure baked BELOW args; the
                    # published value then stays args and the variant
                    # field must say so (the tripwire's variant matching
                    # depends on it)
                    print("bench: baked re-measure "
                          f"({baked_fps:.1f} f/s) below the args number "
                          f"({throughput_args:.1f}); keeping "
                          "weights-as-args as the headline",
                          file=sys.stderr)
            except Exception as e:  # never let the re-measure kill bench
                print(f"bench: baked headline re-measure skipped: {e}",
                      file=sys.stderr)
        else:
            print("bench: budget: skipping headline_baked (baked program "
                  f"not ready within {budget:.0f}s spare; weights-as-args "
                  "number stands)", file=sys.stderr)
            skipped.append("headline_baked")
        phase_done("headline_baked")

    # int8 serving: CLOSED by measurement this round — XLA on v5e has no
    # int8 conv fast path (s8 convs run ~3x slower than bf16 and a lone s8
    # conv compile hangs >10 min; tools/probe_int8.py, verdict in
    # models/vgg_int8.py). The per-round sweep is retired; the opt-in
    # cfg.vgg_int8 mode remains for numerics experiments only.

    flops = frame_flops(cfg)
    achieved_tflops = throughput * flops / 1e12
    peak = _chip_peak_tflops(dev)
    result = {
        "metric": "tracked_frames_per_sec_per_chip",
        "value": round(float(throughput), 1),
        "unit": "frames/s",
        "vs_baseline": round(float(throughput) / 1000.0, 3),
        "pipelined_frame_ms_b1": round(device_ms, 3) if device_ms == device_ms else None,
        "pipelined_frame_ms_b1_med": (round(device_ms_med, 3)
                                      if device_ms_med == device_ms_med else None),
        "p10_roundtrip_ms_b1": round(lat_p10, 3) if lat_p10 == lat_p10 else None,
        "p50_roundtrip_ms_b1": round(lat_ms, 3) if lat_ms == lat_ms else None,
        "p90_roundtrip_ms_b1": round(lat_p90, 3) if lat_p90 == lat_p90 else None,
        "roundtrip_n": lat_n or None,
        "best_batch": best_batch,
        "headline_variant": headline_variant,
        "frames_per_sec_weights_as_args": round(float(throughput_args), 1),
        "frame_gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu": round(achieved_tflops / peak, 3) if peak else None,
        "device_loop_frames_per_sec": (round(float(devloop_fps), 1)
                                       if devloop_fps else None),
        "train_frames_per_sec_cached": round(train_fps, 1) if train_fps else None,
        "train_step_ms_cached": round(train_ms, 2) if train_ms else None,
        "train_mfu": (_train_mfu(train_ms, peak, *train_shape)
                      if train_ms else None),
        "budget_skipped": skipped or None,
        "platform": platform,
    }
    print(json.dumps(result))
    sys.stdout.flush()

    # regression tripwire vs the previous round's recorded bench: checked
    # now (so the verdict rides the stderr tail either way) but raised
    # only AFTER the TRACK artifact below — a regression must not cost
    # the round its accuracy record
    regressions = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if platform != "cpu":
        prev_n, prev = _previous_bench_metrics(root)
        if prev:
            prev_variant = prev.get("headline_variant", "baked-constants")
            if prev_variant != headline_variant:
                # don't flag a measurement-mode difference as a perf
                # regression (pre-r5 records are implicitly baked)
                prev = {k: v for k, v in prev.items()
                        if k not in _VARIANT_DEPENDENT}
                print(f"bench: regression check: headline variant differs "
                      f"({prev_variant} -> {headline_variant}); value/mfu "
                      "excluded from the comparison", file=sys.stderr)
            regressions = _bench_regressions(result, prev)
            compared = [k for k in _TRIPWIRE_FIELDS
                        if prev.get(k) is not None
                        and result.get(k) is not None]
            print(f"bench: regression check vs BENCH_r{prev_n:02d}: "
                  f"compared {compared}: "
                  + ("; ".join(
                      f"{k} {p:g} -> {c:g} REGRESSED >"
                      f"{_REGRESSION_FRAC:.0%}" for k, p, c in regressions)
                     or "all within bounds"),
                  file=sys.stderr)
        else:
            print("bench: regression check: no previous BENCH_r*.json",
                  file=sys.stderr)

    # per-round accuracy artifact TRACK_r0N.json (stderr/file only — the
    # stdout contract stays one JSON line). Runs AFTER the bench line so a
    # driver-side timeout cannot cost the round its benchmark record; its
    # training budget adapts to the remaining deadline (minus a small
    # margin for the final file writes).
    if platform != "cpu":
        try:
            _write_track_artifact(deadline=deadline - 15)
        except Exception as e:
            print(f"bench: TRACK artifact failed: {e}", file=sys.stderr)
        phase_done("track_artifact")

    if regressions:
        print("bench: REGRESSION TRIPWIRE: exiting nonzero (metric JSON "
              "and TRACK artifact are already written)", file=sys.stderr)
        raise SystemExit(3)


def _device_loop_throughput(cfg, core, vgg_params, params, B: int,
                            H: int = 360, W: int = 640,
                            iters: int = 20) -> float:
    """Frames/s of the closed device loop (make_device_track_step) at
    batch B over raw HxW frames: includes the on-device crop_and_resize
    and recrop-feedback geometry the headline frame-step number excludes.
    Same best-of-3, value-fetch-sync protocol as bench_batch."""
    import jax.numpy as jnp

    from ntm_tracker_tpu.tracking.tracker import make_device_track_step

    init_fn, step_fn = make_device_track_step(cfg, core, vgg_params, params)
    rng = np.random.RandomState(1)
    nb = min(B, 16)  # bound host scratch; identical tiles cost the same
    block = (rng.rand(nb, H, W, 3) * 255).astype(np.float32)
    frames = jnp.asarray(
        np.tile(block, (-(-B // nb), 1, 1, 1))[:B] if B > nb else block)
    bbox = jnp.tile(jnp.asarray([[0.3, 0.3, 0.6, 0.6]], jnp.float32), (B, 1))
    state = init_fn(frames, bbox, core.init_state(params, B))
    region, bbox, state = step_fn(frames, bbox, state)  # compile
    np.asarray(region)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            region, bbox, state = step_fn(frames, bbox, state)
        np.asarray(region)  # value fetch = hard sync (see bench_batch)
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


def _train_mfu(train_ms: float, peak_tflops: float | None,
               B: int, L: int):
    """Canonical 3x-forward matmul FLOPs of the measured cached train step
    (same B/L as _cached_train_throughput) against the chip's bf16 peak
    (remat recompute not credited). The number is intentionally
    low-looking: the 1300-step BPTT is HBM/VPU bound, not MXU bound — see
    tools/profile_train.py's sweep (bf16 matmuls measured ZERO speedup at
    this shape)."""
    if not peak_tflops:
        return None
    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.tools.profile_train import train_step_flops

    cfg = TrackerConfig(train=TrainConfig(batch_size=B, sequence_length=L))
    achieved = train_step_flops(cfg) / (train_ms / 1e3) / 1e12
    return round(achieved / peak_tflops, 4)


def _write_track_artifact(deadline: float | None = None):
    """TRACK_r0N.json at the repo root; N = 1 + the latest BENCH round on
    disk (bench.py runs before the driver records BENCH_r0N, so the next
    round number is max+1). NTM_TRACK_STEPS overrides the training budget
    (default 400: with batches now cropped host-side a 400-step training is
    ~50 s/core, and the 400-step tracker is measurably more contractive —
    r4 drift 9.6 px vs 12.8 px at 200 steps with the HIGH-precision crop;
    the device loop has since moved to a HIGHEST/f32-exact crop, which
    alone cuts the 200-step drift to 2.59 px — with better scene IoUs);
    `deadline` additionally stops each core's training early so the
    artifact always completes inside the budget."""
    import os

    from ntm_tracker_tpu.tools.track_artifact import write_artifact

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # max+1 over every BENCH_r*.json already lands past all closed rounds:
    # re-running bench within the SAME round refreshes TRACK_r0N, while a
    # round closed by a BENCH record can never lose its accuracy artifact
    # (the scan is shared with the regression tripwire)
    n = _latest_bench_record(root)[0] + 1
    steps = int(os.environ.get("NTM_TRACK_STEPS", "400"))
    write_artifact(os.path.join(root, f"TRACK_r{n:02d}.json"), steps,
                   deadline=deadline)


def _cached_train_throughput(B: int = 256, L: int = 20, iters: int = 10):
    """Full train step (grads + 1300-step BPTT + RMSProp) on precomputed
    tokens, the train-offsets --feature_cache path. Returns (frames/s,
    step_ms). B=256 is the measured knee for BOTH training paths: fused
    Pallas BPTT (the TrainConfig "auto" default on one TPU chip) 24.6k
    f/s at 256 vs 23.8k at 128 (fused B=512 fails to compile — see
    scan_bptt.py); the XLA scan knee was 17.8k at 256 vs 16.7k at 128
    and 15.7k at 512 (tools/bench_train.py + bench_bptt_knee.py)."""
    import jax

    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        synthetic_cached_batch,
        train_step_with_bptt_fallback,
    )

    cfg = TrackerConfig(train=TrainConfig(batch_size=B, sequence_length=L))
    exp = OffsetExperiment(
        cfg, init_vgg_params(jax.random.PRNGKey(0)), image_mode="cropped"
    )
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    # B=256 runs the fused Pallas BPTT (fused_bptt="auto"); a compile-
    # service failure degrades to the XLA scan instead of killing bench
    step = train_step_with_bptt_fallback(exp)
    n = B * L
    batch = synthetic_cached_batch(cfg, np.random.RandomState(0))
    p, o, m = step(params, opt_state, batch)  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, batch)
    float(m["loss"])  # value fetch = hard sync
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt * 1e3


if __name__ == "__main__":
    main()
