"""Headline benchmark: pseudo-label generation images/sec/chip
(BASELINE.json:2 primary metric).

Workload = BASELINE.json config #3, the FULL per-batch pseudo workload
(SURVEY.md §3.2 hot loop — VERDICT r1 item 6): uint8 target batch ->
device-side mean/std normalization -> three ESPNetv2 (s=2.0, bf16) source
models (CamVid 11, Cityscapes 19, Forest 5 classes) at 480x256 -> fused
softmax -> label-space conversion -> soft fusion -> kc threshold -> per-class
CBST confidence-histogram accumulation, all in ONE jitted program per batch.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline",
"anchor_img_s", "anchor_date", ...}.  Everything else (heartbeats, phase
timings, retries) goes to stderr so a killed run still leaves a diagnosis
in the driver's output tail.

Hardened for the axon remote-TPU tunnel (VERDICT r3 item 1 — BENCH_r03 was
rc=124/parsed:null because a hung attempt produced NO output):

  * parent/child split: the parent process (this __main__, no jax import)
    spawns the measurement as a child (`--attempt`), bounds it with a
    hard timeout, and retries; a wedged PJRT call cannot out-wait the
    driver anymore.
  * child watchdog thread: os._exit(86) at MSPL_BENCH_WATCHDOG seconds —
    works even when the main thread is stuck inside a blocking C call
    (signal handlers would be deferred there).
  * heartbeat lines `[bench +12.3s] <phase>` on stderr at every phase.
  * minimal time-to-first-live-result (VERDICT r4 item 1): a batch-8
    LIVE-CHECK line lands before the full-batch program is even touched,
    warmup is ONE iteration, and a PROVISIONAL result line (same schema +
    "provisional": true) follows 2 timed iterations later; if the full
    measurement then hangs, the parent promotes the latest of those lines
    to stdout — a degraded-tunnel round still leaves live evidence.
  * attempt 1 gets the FULL deadline minus a small reserve; retries only
    recover FAST crashes (first device contact costs 4-450s and every
    fresh child pays it again, so any split across attempts — r4's
    420s/83s — guarantees failure on slow days).
  * after a live headline, the parent re-measures the jnp_naive anchor
    (time-boxed bench_anchor.py child) so anchor and headline are
    same-run comparable (VERDICT r4 item 5); on anchor failure the dated
    file stands and the JSON says so.
  * on success the result is mirrored to .bench_last.json; if every
    attempt fails, the parent emits that last-good result clearly marked
    "stale_from" rather than nothing at all.

vs_baseline divides by the REFERENCE-EQUIVALENT pipeline on the same chip
(VERDICT r1 item 5): a straight fp32/NHWC/unfused port of the reference's
per-batch loop measured by `bench_anchor.py` (jnp_naive mode), which
records its number + date into ANCHOR.json; bench.py embeds both in its
output so every BENCH_rN.json is self-contained (VERDICT r3 item 7).  The
literal torch-CPU reference pipeline is also recorded in BASELINE.md
("Anchors") — this container has 1 CPU core, so that number carries a
hardware caveat and is not used as the divisor.

Workload-size env overrides (used by tests/test_bench_cpu.py to exercise
this script end-to-end on the CPU backend in seconds):
MSPL_BENCH_BATCH, MSPL_BENCH_HW ("H,W"), MSPL_BENCH_S, MSPL_BENCH_ITERS,
MSPL_BENCH_WARMUP.
"""

import json
import os
import sys
import time

import numpy as np

# Anchor fallbacks, used only when ANCHOR.json is missing (see BASELINE.md
# "Anchors"; re-measure with bench_anchor.py — it writes ANCHOR.json):
#   reference-equivalent straight port on this chip (fp32, NHWC, unfused,
#   one dispatch per model).  Load-sensitive through the axon tunnel, so it
#   is re-measured and dated each round: r2 2026-08-17 -> 254.7; r3
#   2026-08-19 -> 310.9.
JNP_NAIVE_ANCHOR = 310.9
JNP_NAIVE_ANCHOR_DATE = "2026-08-19"
#   round-1 first-draft fused-jnp measurement (historical, for continuity
#   with BENCH_r01.json whose vs_baseline divided by this):
R1_RECORDED = 438.9

def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        print(f"[bench] ignoring unparseable {name}", file=sys.stderr)
        return default


BATCH = _env_int("MSPL_BENCH_BATCH", 128)
try:
    _hw = os.environ.get("MSPL_BENCH_HW", "256,480").split(",")
    HW = (int(_hw[0]), int(_hw[1]))  # greenhouse canonical H,W (480x256 WxH)
except (ValueError, IndexError):
    print("[bench] ignoring unparseable MSPL_BENCH_HW", file=sys.stderr)
    HW = (256, 480)
try:
    MODEL_S = float(os.environ.get("MSPL_BENCH_S", "2.0"))
except ValueError:
    MODEL_S = 2.0
NUM_TARGET = 3
# ONE warmup iteration: the provisional timing right behind it doubles as
# warmup for the final timing, and every extra pre-provisional iteration is
# time-to-first-live-result through a tunnel whose dispatches can take
# minutes (VERDICT r4 weak item 1)
WARMUP = _env_int("MSPL_BENCH_WARMUP", 1)
ITERS = _env_int("MSPL_BENCH_ITERS", 12)  # ~1.5 s of steady state
PROVISIONAL_ITERS = 2
# batch size of the live-check probe run before the full-batch program
# (0 = skip; the parent skips it on attempts >= 2 — by then the probe
# evidence either exists or the tunnel is wedged beyond probing)
PROBE_BATCH = _env_int("MSPL_BENCH_PROBE_BATCH", 8)

_T0 = time.monotonic()
REPO = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(REPO, ".bench_last.json")
ANCHOR_FILE = os.path.join(REPO, "ANCHOR.json")

# Only the DEFAULT workload on the default (TPU) platform may write the
# last-good mirror: a CPU test run with MSPL_BENCH_* shrink overrides once
# poisoned .bench_last.json with a tiny-shape number (112.7 img/s), which
# the stale-fallback path would then have reported as the last-good
# headline (r5 incident, 2026-08-21).
_DEFAULT_WORKLOAD = (
    BATCH == 128 and HW == (256, 480) and MODEL_S == 2.0
    and "axon" in os.environ.get("JAX_PLATFORMS", "axon"))


def _hb(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _read_anchor():
    """(anchor_img_s, anchor_date) from ANCHOR.json if bench_anchor.py has
    written one, else the hardcoded last-measured fallback."""
    try:
        with open(ANCHOR_FILE) as f:
            a = json.load(f)
        return float(a["jnp_naive_img_per_sec_per_chip"]), str(a["date"])
    except (OSError, KeyError, ValueError):
        return JNP_NAIVE_ANCHOR, JNP_NAIVE_ANCHOR_DATE


def _emit(payload: dict, provisional: bool = False) -> None:
    """Write one result line to stdout (the parent harvests the last one)
    and mirror final results to .bench_last.json."""
    if provisional:
        payload = dict(payload, provisional=True)
    print(json.dumps(payload), flush=True)
    if not provisional and _DEFAULT_WORKLOAD:
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump(dict(payload, date=time.strftime("%Y-%m-%d")), f)
        except OSError:
            pass


def _result(images_per_sec_per_chip: float) -> dict:
    anchor, anchor_date = _read_anchor()
    return {
        "metric": "pseudo_label_gen_images_per_sec_per_chip",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / anchor, 3),
        "anchor_img_s": anchor,
        "anchor_date": anchor_date,
        "baseline_anchor": "reference-equivalent straight port on same chip "
                           f"({anchor} img/s, bench_anchor.py)",
        "vs_r1_first_draft": round(images_per_sec_per_chip / R1_RECORDED, 3),
    }


def _die_if_hook(stage: str) -> None:
    """Test hook: MSPL_BENCH_DIE_AFTER=<stage> hard-kills the child right
    after that stage's line is emitted, simulating a tunnel hang at the
    next phase so tests can gate the parent's promotion of partial live
    results (live_check / provisional)."""
    if os.environ.get("MSPL_BENCH_DIE_AFTER") == stage:
        _hb(f"test hook: dying after {stage}")
        os._exit(71)


def _apply_platform(jax) -> None:
    """Honor a JAX_PLATFORMS=cpu request in-process.  The environment's
    axon sitecustomize registers the TPU plugin and pins the platform at
    interpreter start, so the env var alone is ineffective (verified r5:
    JAX_PLATFORMS=cpu still yields platform tpu); `jax.config.update`
    after import is the only reliable switch (same mechanism as
    tests/conftest.py).  Without this, the 'CPU-backend' bench tests were
    silently dispatching through the remote-TPU tunnel — whose first
    device contact costs 28-450s — and timing out on degraded days."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        jax.config.update("jax_platforms", plat)


def _arm_watchdog() -> None:
    """Kill THIS process at MSPL_BENCH_WATCHDOG seconds no matter what the
    main thread is blocked in.  A thread + os._exit works where
    signal.alarm does not: SIGALRM's Python handler is deferred while the
    main thread sits inside a blocking PJRT call."""
    import threading

    budget = float(os.environ.get("MSPL_BENCH_WATCHDOG", "0") or 0)
    if budget <= 0:
        return

    def _die():
        _hb(f"WATCHDOG fired after {budget:.0f}s — aborting attempt")
        os._exit(86)

    t = threading.Timer(budget, _die)
    t.daemon = True
    t.start()


def main():
    _arm_watchdog()
    _hb("importing jax")
    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever run pays ~minutes of XLA compiles
    # (3 large models via the remote-TPU tunnel); subsequent runs are warm
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _apply_platform(jax)

    # device liveness: one tiny matmul round-trip before anything heavy, so
    # the heartbeat log distinguishes "tunnel wedged" from "big executable
    # slow to load" (r4's 390 s warmup hang was undiagnosable)
    _hb("first device contact (tiny matmul; measured 28-450s through the "
        "axon tunnel depending on load)")
    t0 = time.perf_counter()
    float(jnp.ones((128, 128)).sum())
    _hb(f"device liveness ok ({time.perf_counter() - t0:.2f}s round-trip)")

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.data.transforms import normalize
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
    from mspl_tpu.pseudo.cbst import class_confidence_histograms

    _hb(f"building models (batch={BATCH} hw={HW} s={MODEL_S})")
    rng = jax.random.PRNGKey(0)
    sources = []
    for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
        # channel-major logits: the final resize einsum emits [B,C,H,W] for
        # free, feeding the fused Pallas pseudo pass with W as lanes
        model = ESPNetv2Segmentation(num_classes=classes, s=MODEL_S,
                                     compute_dtype=jnp.bfloat16,
                                     channel_major_logits=True,
                                     fuse_stages=bool(int(os.environ.get(
                                         "MSPL_FUSE_STAGES", "0"))),
                                     layout_contract=bool(int(os.environ.get(
                                         "MSPL_LAYOUT_CONTRACT", "0"))))
        variables = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
        sources.append((model, variables, label_conversion_matrix(name)))

    kc = jnp.asarray(np.full(NUM_TARGET, 0.5, np.float32))
    mats = [c for _, _, c in sources]
    # HYBRID weight passing (r5 A/B, all same-day): constants-baked
    # executables embed all 3 models' parameters — steady state 1440.9
    # img/s but 56-78 s device load through the tunnel EVEN CACHE-WARM;
    # argument-passed weights load in 12-14 s but XLA loses weight
    # pre-layout/folding and steady state drops ~6.5% (1342/1350).  So the
    # batch-8 live-check uses ARGUMENTS (its job is fast live evidence)
    # and the headline program bakes CONSTANTS (its job is peak
    # throughput, and the budget now survives its load).
    var_list = tuple(v for _, v, _ in sources)

    def _pass(imgs_u8, var_list):
        # full workload: normalize (device-side, as the real loader path
        # does) -> single bf16 cast -> 3 forwards -> fused pass -> CBST
        # histogram accumulation for the next round's kc
        imgs = normalize(imgs_u8).astype(jnp.bfloat16)
        logits = [m.apply(v, imgs, train=False)
                  for (m, _, _), v in zip(sources, var_list)]
        lab, conf = fused_pseudo_soft_cm(logits, mats, kc=kc)
        hist = class_confidence_histograms(lab, conf, NUM_TARGET)
        return lab, conf, hist

    # per-chip semantics (VERDICT r2 item 9): on a multi-chip host the
    # batch is sharded over a pure-DP mesh (shard_map, the production
    # pattern from pseudo/generate.py — Pallas calls stay shard-local) so
    # dividing by device_count is correct by construction; the 1-chip
    # bench host takes the plain jit path
    n_chips = max(jax.device_count(), 1)
    imgs_u8 = jax.random.randint(
        rng, (BATCH, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    if n_chips > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mspl_tpu.parallel.mesh import make_mesh_for_batch, \
            shard_map_compat

        mesh = make_mesh_for_batch(BATCH)
        assert mesh.shape["data"] == n_chips, (
            f"BATCH {BATCH} not shardable over {n_chips} chips; per-chip "
            "number would be wrong")

        def _sharded(imgs_u8):
            lab, conf, hist = _pass(imgs_u8, var_list)
            return lab, conf, jax.lax.psum(hist, "data")

        pseudo_batch = jax.jit(shard_map_compat(
            _sharded, mesh, in_specs=P("data"),
            out_specs=(P("data"), P("data"), P())))
        imgs_u8 = jax.device_put(imgs_u8, NamedSharding(mesh, P("data")))
    else:
        pseudo_batch = jax.jit(lambda b: _pass(b, var_list))
        imgs_u8 = jax.device_put(imgs_u8)

    # warmup / compile.  Syncs use a 1-element host fetch, not
    # block_until_ready: the latter can return early through the remote-TPU
    # tunnel (see mspl_tpu/utils/profiling.py::device_sync; the fetch-synced
    # number was cross-checked equal here, 1149.9 vs 1146.8).
    from mspl_tpu.utils.profiling import device_sync

    # live-check probe: the SAME workload at a tiny batch, measured and
    # emitted BEFORE the full-batch program is compiled/loaded.  If the
    # full-batch attempt then stalls, the parent promotes this line — the
    # round still records a value measured live in this run (marked
    # "live_check_batch" so it is never mistaken for the headline shape).
    if PROBE_BATCH > 0 and PROBE_BATCH < BATCH and n_chips == 1:
        _hb(f"live-check probe (batch {PROBE_BATCH})")
        # device-side slice: a host round-trip of the full 47 MB batch
        # here would cost seconds-to-minutes on exactly the degraded days
        # the probe exists for
        probe_in = imgs_u8[:PROBE_BATCH]
        probe_fn = jax.jit(_pass)
        lab, conf, hist = probe_fn(probe_in, var_list)
        device_sync((lab, hist))
        t0 = time.perf_counter()
        for _ in range(2):
            lab, conf, hist = probe_fn(probe_in, var_list)
        device_sync((lab, hist))
        probe_rate = PROBE_BATCH * 2 / (time.perf_counter() - t0)
        _emit(dict(_result(probe_rate), live_check_batch=PROBE_BATCH,
                   note=f"degraded-mode live probe at batch {PROBE_BATCH}; "
                        "NOT the headline shape"), provisional=True)
        _hb(f"live-check: {probe_rate:.1f} img/s at batch {PROBE_BATCH}")
        _die_if_hook("live_check")

    _hb("warmup/compile (first-ever run: minutes; warm cache: ~30s)")
    for i in range(WARMUP):
        lab, conf, hist = pseudo_batch(imgs_u8)
        device_sync((lab, hist))
        _hb(f"warmup {i + 1}/{WARMUP} done")

    _hb(f"provisional timing ({PROVISIONAL_ITERS} iters)")
    t0 = time.perf_counter()
    for _ in range(PROVISIONAL_ITERS):
        lab, conf, hist = pseudo_batch(imgs_u8)
    device_sync((lab, hist))
    dt = time.perf_counter() - t0
    prov = BATCH * PROVISIONAL_ITERS / dt / n_chips
    _emit(_result(prov), provisional=True)
    _hb(f"provisional: {prov:.1f} img/s/chip")
    _die_if_hook("provisional")

    _hb(f"full timing ({ITERS} iters)")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        lab, conf, hist = pseudo_batch(imgs_u8)
    device_sync((lab, hist))
    dt = time.perf_counter() - t0

    images_per_sec_per_chip = BATCH * ITERS / dt / n_chips
    _emit(_result(images_per_sec_per_chip))
    _hb(f"final: {images_per_sec_per_chip:.1f} img/s/chip")

    # same-day anchor discipline (VERDICT r4 item 5): with the headline in
    # hand and the device session already established (first contact through
    # the tunnel costs 28-450s in a FRESH process, ~0 here), re-measure the
    # jnp_naive anchor in-process and re-emit the headline against it.  The
    # parent promotes the LAST line; if this hangs, the watchdog fires and
    # the already-emitted line above stands.
    _, anchor_date = _read_anchor()
    if (os.environ.get("MSPL_BENCH_ANCHOR", "1") != "0"
            and anchor_date != time.strftime("%Y-%m-%d")):
        _hb("re-measuring jnp_naive anchor in-process (stale date: "
            f"{anchor_date})")
        try:
            from bench_anchor import measure_and_write_anchor

            anchor = measure_and_write_anchor()
            _hb(f"anchor refreshed: {anchor:.1f} img/s")
            _emit(_result(images_per_sec_per_chip))
        except Exception as e:  # never trade the headline for the anchor
            _hb(f"anchor refresh failed: {e!r}; dated anchor stands")


def main_io(n_images: int = 512, cache: bool = False):
    """Disk-backed end-to-end mode (VERDICT r2 item 3): real PNGs on disk ->
    native C++ batch decode -> host->device DMA -> the same full device
    workload.  This is the like-for-like number against the reference's
    disk-mediated batch job (SURVEY.md §3.2 DISK BOUNDARY); the default
    `main()` times the device pipeline alone.  `--io-cache` additionally
    enables the bounded decoded-uint8 cache and sweeps the set twice,
    reporting the second (cached) sweep — the self-training steady state.
    Measured numbers: BASELINE.md "Disk-backed end-to-end"."""
    import tempfile

    _arm_watchdog()
    _hb("importing jax (io mode)")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _apply_platform(jax)

    from mspl_tpu.data.datasets import GreenhouseRGBD
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import make_source
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="mspl_bench_io") as root:
        # synthesize a PNG target set at the canonical greenhouse size
        h, w = HW
        lst = []
        from PIL import Image

        for i in range(n_images):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{root}/img_{i:05d}.png",
                                      compress_level=6)
            lst.append(f"img_{i:05d}.png")
        list_path = f"{root}/list.txt"
        with open(list_path, "w") as f:
            f.write("\n".join(lst) + "\n")
        _hb(f"synthesized {n_images} PNGs")

        jrng = jax.random.PRNGKey(0)
        sources = []
        for name, classes in (("camvid", 11), ("cityscapes", 19),
                              ("forest", 5)):
            model = ESPNetv2Segmentation(num_classes=classes, s=MODEL_S,
                                         compute_dtype=jnp.bfloat16,
                                         channel_major_logits=True)
            variables = init_model(model, HW,
                                   rng=jax.random.fold_in(jrng, classes))
            sources.append(make_source(name, model, variables, name,
                                       channel_major=True))

        ds = GreenhouseRGBD(root, list_path, size_wh=(w, h))
        if cache:
            ds.enable_cache(4 << 30)

        # Component rates, reported alongside the end-to-end number so the
        # reader can tell WHAT bounds it (BASELINE.md "Disk-backed
        # end-to-end"): the host decode rate is reproducible (1-core zlib
        # inflate); the h2d rate through this environment's remote-TPU
        # tunnel fluctuates 3-25 MB/s with server load and dominates the
        # end-to-end number whenever it dips (a locally-attached TPU does
        # tens of GB/s and would leave the decode rate as the bound).
        t0 = time.perf_counter()
        for b in DataLoader(ds, batch_size=BATCH):
            b["image"][0].sum()  # touch; stays on host
        decode_rate = n_images / (time.perf_counter() - t0)
        _hb(f"decode-only: {decode_rate:.1f} img/s")

        one = np.zeros((BATCH, h, w, 3), np.uint8)
        jax.device_put(one).block_until_ready()  # warm the transfer path
        t0 = time.perf_counter()
        jax.device_put(one).block_until_ready()
        h2d_mbps = one.nbytes / (time.perf_counter() - t0) / 1e6
        _hb(f"h2d: {h2d_mbps:.1f} MB/s")

        # production cmd_pseudo flow: device-resident result set, CBST kc
        # sweep + re-threshold on device, ONE uint8 label fetch for the set.
        # The generator is built ONCE — a fresh generate_pseudo_labels call
        # per sweep re-traces and re-loads the compiled pass, ~31 s through
        # this tunnel even warm (the r4 11.55 img/s artifact in
        # /tmp/bench_io.log was exactly that; BASELINE.md "Disk-backed
        # end-to-end" records the probe).
        from mspl_tpu.pseudo.cbst import apply_kc_device, sweep_kc
        from mspl_tpu.pseudo.generate import PseudoLabelGenerator

        gen = PseudoLabelGenerator(sources)

        def sweep():
            t0 = time.perf_counter()
            labels, confs, idx = gen(
                DataLoader(ds, batch_size=BATCH), return_device=True)
            kc = sweep_kc(labels, confs, NUM_TARGET, 0.5)
            np.asarray(apply_kc_device(labels, confs, kc))
            return len(idx) / (time.perf_counter() - t0)

        r0 = sweep()  # warmup sweep: compiles; with --io-cache also fills it
        _hb(f"warmup sweep done ({r0:.1f} img/s)")
        rate = sweep()
        anchor, anchor_date = _read_anchor()
        print(json.dumps({
            "metric": ("pseudo_label_gen_images_per_sec_disk_cached" if cache
                       else "pseudo_label_gen_images_per_sec_disk"),
            "value": round(rate, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(rate / anchor, 3),
            "anchor_img_s": anchor,
            "anchor_date": anchor_date,
            "n_images": n_images,
            "decode_only_img_per_sec": round(decode_rate, 1),
            "h2d_MBps": round(h2d_mbps, 1),
            "note": "end-to-end: PNG decode -> DMA -> device pipeline"
                    + (" (decoded-uint8 cache hot)" if cache else ""),
        }), flush=True)


def _last_json_line(path: str):
    """Last parseable JSON object line of the child's captured stdout."""
    best = None
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        best = json.loads(line)
                    except ValueError:
                        pass
    except OSError:
        pass
    return best


def _refresh_anchor(budget: float) -> str:
    """Re-measure the jnp_naive anchor in a time-boxed child so anchor and
    headline come from the same run/tunnel conditions (VERDICT r4 item 5).
    Returns a status: 'fresh' (already measured today), 'refreshed',
    'disabled' (MSPL_BENCH_ANCHOR=0), 'skipped (budget)', or 'failed'."""
    import subprocess

    _, anchor_date = _read_anchor()
    if anchor_date == time.strftime("%Y-%m-%d"):
        return "fresh"
    if os.environ.get("MSPL_BENCH_ANCHOR", "1") == "0":
        return "disabled"
    if budget < 30:
        _hb(f"skipping anchor refresh (only {budget:.0f}s left)")
        return "skipped (budget)"
    _hb(f"refreshing jnp_naive anchor (budget {budget:.0f}s)")
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench_anchor.py"),
             "jnp_naive"], stdout=subprocess.DEVNULL, stderr=None)
        try:
            rc = proc.wait(timeout=budget)
        except subprocess.TimeoutExpired:
            _hb("anchor refresh timed out — killing; dated file stands")
            proc.kill()
            proc.wait()
            return "failed"
    except OSError:
        return "failed"
    ok = rc == 0
    _hb("anchor refreshed" if ok else f"anchor refresh failed (rc={rc})")
    return "refreshed" if ok else "failed"


def _with_current_anchor(got: dict, status: str) -> dict:
    """Recompute the anchor-relative fields of a result line from the anchor
    file as it stands NOW (possibly just refreshed).  `status` comes from
    `_refresh_anchor`; anything other than a same-day anchor is reported
    verbatim so the artifact distinguishes an intentional skip from a
    tunnel failure."""
    anchor, anchor_date = _read_anchor()
    got = dict(got, anchor_img_s=anchor, anchor_date=anchor_date,
               baseline_anchor="reference-equivalent straight port on same "
                               f"chip ({anchor} img/s, bench_anchor.py)")
    if isinstance(got.get("value"), (int, float)):
        got["vs_baseline"] = round(got["value"] / anchor, 3)
    if status not in ("fresh", "refreshed"):
        got["anchor_refresh"] = (
            f"{status} this run; anchor is from {anchor_date}")
    return got


def orchestrate(argv) -> int:
    """Parent process: bound each measurement attempt with a hard timeout,
    retry transient tunnel failures, and ALWAYS print one JSON line.  No
    jax import here — a wedged child cannot wedge the parent.

    Budget shape (VERDICT r4 item 1, revised by a round-5 measurement):
    attempt 1 gets the FULL deadline minus a small reserve.  The dominant
    pre-dispatch cost is FIRST DEVICE CONTACT through the axon tunnel — a
    bare 128x128 matmul round-trip measured at 28s and 452s on the same
    day (r5, 2026-08-21), independent of program size — and every fresh
    child pays it again, so splitting the deadline across attempts (r4:
    420s/83s; an even 3-way split would be 172s each) guarantees failure
    whenever first contact is slow.  Retries exist only to recover from
    FAST crashes, which leave most of the budget unspent.  After a live
    headline, leftover budget re-measures the anchor (item 5)."""
    import subprocess
    import tempfile

    # the driver tolerated a 527 s total in r4 and killed at 600 in r3
    # (rc=124); keep ~25 s of reserve under that while giving
    # first-contact every second we can (r5 measured a 395 s contact +
    # 74 s cold probe compile just miss a 540 s budget)
    deadline = float(os.environ.get("MSPL_BENCH_DEADLINE", "565"))
    attempts = int(os.environ.get("MSPL_BENCH_ATTEMPTS", "3"))
    per_attempt = float(os.environ.get("MSPL_BENCH_ATTEMPT_TIMEOUT",
                                       str(deadline)))
    start = time.monotonic()
    best = None  # provisional result from a partially-successful attempt

    def _remaining():
        return deadline - (time.monotonic() - start)

    for attempt in range(attempts):
        remaining = _remaining()
        if remaining < 30:
            _hb(f"deadline budget exhausted before attempt {attempt + 1}")
            break
        budget = min(remaining - 5, per_attempt)
        env = dict(os.environ, MSPL_BENCH_WATCHDOG=str(max(budget - 10, 20)))
        if attempt > 0:
            # probe evidence either exists from attempt 1 or the tunnel is
            # wedged beyond probing — later attempts go straight for the
            # headline shape (unconditional: an externally-pinned
            # PROBE_BATCH must not re-spend retry budget on the probe)
            env["MSPL_BENCH_PROBE_BATCH"] = "0"
        with tempfile.NamedTemporaryFile("w+", suffix=".bench.jsonl",
                                         delete=False) as tf:
            out_path = tf.name
        _hb(f"attempt {attempt + 1}/{attempts} (budget {budget:.0f}s)")
        with open(out_path, "w") as out:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--attempt",
                 *argv], stdout=out, stderr=None, env=env)
            try:
                rc = proc.wait(timeout=budget)
            except subprocess.TimeoutExpired:
                _hb("attempt timed out at the parent backstop — killing")
                proc.kill()
                proc.wait()
                rc = -9
        got = _last_json_line(out_path)
        os.unlink(out_path)
        if got is not None and not got.get("provisional"):
            status = _refresh_anchor(max(min(_remaining() - 10, 120), 0))
            print(json.dumps(_with_current_anchor(got, status)),
                  flush=True)
            return 0
        if got is not None:
            _hb("attempt died after a live partial measurement; keeping it")
            best = got
        _hb(f"attempt {attempt + 1} failed (rc={rc})")
        if attempt + 1 < attempts:
            time.sleep(20)  # let a killed TPU client's device error settle

    if best is not None:
        status = _refresh_anchor(max(min(_remaining() - 10, 120), 0))
        print(json.dumps(_with_current_anchor(best, status)), flush=True)
        return 0
    last = _last_json_line(LAST_GOOD)
    if last is not None:
        _hb("all attempts failed; emitting the LAST-GOOD result, marked "
            "stale")
        last["stale_from"] = last.pop("date", "unknown")
        last["error"] = "live measurement failed this run; value is the "\
                        "most recent successful local measurement"
        print(json.dumps(last), flush=True)
        return 0
    print(json.dumps({
        "metric": "pseudo_label_gen_images_per_sec_per_chip",
        "value": None, "unit": "images/sec/chip", "vs_baseline": None,
        "error": "all measurement attempts hung or crashed; see stderr "
                 "heartbeats"}), flush=True)
    return 1


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    child = "--attempt" in argv
    argv = [a for a in argv if a != "--attempt"]
    io_mode = "--io" in argv or "--io-cache" in argv
    if child:
        if io_mode:
            main_io(cache="--io-cache" in argv)
        else:
            main()
    else:
        sys.exit(orchestrate(argv))
