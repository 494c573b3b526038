"""Benchmark: bilevel fine-tune throughput of the APTP-pruned SD-2.1 expert.

Measures the framework's north-star metric (BASELINE.md): samples/sec/chip of
the bilevel training mix — 9 lower steps (teacher fwd + pruned-student
fwd/bwd + distillation losses + AdamW) and 1 ESD upper step (2 teacher fwds +
student fwd/bwd on a second AdamW) per 10, the reference cadence
(upper_step_freq=10, trainer.py:2793-2816) — at 512px on real SD-2.1 shapes.
Weights are randomly/zeros initialized — throughput is weight-independent —
and the student is a ~55%-MACs materialized expert, mirroring the reference's
expert-2 checkpoint. The best bilevel configuration is batch 8 x grad-accum
2 — the reference bilevel config's effective batch 16/chip
(configs/baselines/sd-2-1_coco_aptp_both_512_bilevel.yaml:48), accumulated
inside the jitted step. ``--lower-only`` reproduces round 1's
lower-step-only number.

The driver reads the LAST JSON line printed, so the default bilevel mode is
staged to survive a hard timeout from a cold jit cache:

  stage F: serialized-executable fast path (utils/aot.py + .jax_exec/,
           regenerate with ``--save-exec``): ONE child loads the
           pre-compiled accum-1 and accum-2 step executables (~80s for all
           four; no tracing, no compiling) and measures both modes,
           printing each JSON line directly to the shared stdout the
           moment it lands. Attempted only when the artifacts' source
           fingerprint matches (checked JAX-free by the parent). Its real
           cost is the axon PER-PROCESS first-dispatch stall (7-440s
           normally, worse on degraded nights) — which every strategy
           pays, while stage F uniquely skips trace+compile on top.
  stage A: batch 8 x accum 1 (the round-2 driver-verified mode) — fallback
           when stage F fails fast; its JSON line prints IMMEDIATELY. Warm
           .jax_cache (fingerprint stamp matches AND the big step entries
           exist): ~3 min. Cold: --parallel-precompile, ~810s end-to-end
           (r2/r4, healthy service) with nearly the whole budget.
  stage B: batch 8 x accum 2 (the reference's effective batch 16/chip) —
           attempted only when cache-warm and enough budget remains; an
           improved JSON line is printed only if it completes and beats
           stage A.

Either way the process exits 0 with at least one valid JSON line well
inside the budget (env BENCH_BUDGET_S, default 1000s — round 2's full cold
run finished in ~800s under the driver). ``--grad-accum N`` skips staging
and runs one mode directly.

Wall-clock caveat (measured r4): the experimental axon platform has a
highly variable per-process first-dispatch stall (7s to 440s for the same
trivial warm program in back-to-back fresh processes) — the staging exists
to make the CONTROLLABLE costs (trace/compile) near-zero and to keep every
already-printed line safe from a later kill; the stall itself is tunnel-
side and irreducible from here.

``vs_baseline`` is measured against an estimated 10 samples/sec/GPU for the
reference's torch/accelerate loop on A100 (the repo publishes no numbers —
BASELINE.json published:{}; see BASELINE.md). The --prune modes scale that
estimate by each model's per-step compute (see EST_BASELINE_PRUNE).
"""
import argparse
import json
import sys
import time

import numpy as np


EST_REFERENCE_A100_SAMPLES_PER_SEC = 10.0
# --prune vs_baseline denominators, scaled from the SD estimate by per-step
# model compute (the reference publishes no numbers for any of them):
#   sd   — teacher fwd + gated fwd + input-only bwd over the 866M U-Net:
#          same cost class as the bilevel lower step -> 10.0
#   sdxl — the gated SDXL U-Net is ~2.6B params / ~3x the SD step FLOPs at
#          512px -> 10/3
#   flux — a ~4.3B-param MMDiT fwd+bwd at 1024+512 tokens is ~10x the SD
#          pruning step's FLOPs -> 1.0
EST_BASELINE_PRUNE = {"sd": 10.0, "sdxl": 10.0 / 3.0, "flux": 1.0}

_ROOT = None  # set lazily (os import stays inside functions for the parent)


def _root():
    global _ROOT
    if _ROOT is None:
        import os

        _ROOT = os.path.dirname(os.path.abspath(__file__))
    return _ROOT


def _exec_dir():
    import os

    return os.path.join(_root(), ".jax_exec")


def _exec_name(args, bs, kind):
    """Identity of a serialized step executable: everything program-shaping
    that ``build``/``run`` read from args is in the filename; everything
    read from source is in the fingerprint sidecar."""
    ga = max(1, int(getattr(args, "grad_accum", 1) or 1))
    pol = args.remat_policy or "none"
    pl = 0 if getattr(args, "in_loop_vae", False) else 1
    return (
        f"bilevel-{kind}-b{bs}-ga{ga}-r{args.resolution}-k{args.keep_ratio}"
        f"-{args.opt_precision}-remat{int(args.remat)}-{pol}-pl{pl}.exec"
    )


def _load_aot_module():
    """Import utils/aot.py by file path: the staged parent must stay
    JAX-free, and importing the package would pull jax in via __init__."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_unlearn_ft_tpu_aot", os.path.join(_root(), "unlearn_ft_tpu", "utils", "aot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Modules the serialized bilevel lower/upper steps actually trace through.
# Narrowed (round 5) from "every .py under unlearn_ft_tpu/" so that edits to
# scripts, pipelines, data loaders, converters, trainers, or eval code do NOT
# invalidate 1.1GB of committed TPU executables — only step-graph-shaping
# sources do. Keep this list in sync with bench.build's imports (and their
# transitive jitted deps): a module missing here that DOES shape the step
# would let stale executables load silently.
_STEP_GRAPH_ROOTS = (
    "models", "ops", "schedulers", "losses", "parallel",
    "training/steps.py", "training/optim.py",
    "utils/arch.py", "utils/estimation.py", "utils/packing.py", "utils/snr.py",
)


def _exec_fingerprint(aot_mod=None):
    """Source fingerprint guarding the serialized executables: the step-graph
    modules (_STEP_GRAPH_ROOTS — everything the bilevel step traces through)
    plus the source of build()/run() (batch construction, dtypes, optimizer
    wiring). Doc edits, eval/script/pipeline/trainer changes, and anything
    else outside the step graph do NOT invalidate artifacts."""
    import inspect
    import os

    if aot_mod is None:
        aot_mod = _load_aot_module()
    pkg = os.path.join(_root(), "unlearn_ft_tpu")
    return aot_mod.source_fingerprint(
        *[os.path.join(pkg, r) for r in _STEP_GRAPH_ROOTS],
        extra=inspect.getsource(build) + inspect.getsource(run),
        # host-side-only modules inside traced packages: never part of the
        # jitted step program, so edits must not invalidate TPU executables
        exclude=("convert.py", "export.py"),
    )


def _exec_artifacts_fresh(args, ga):
    """JAX-free freshness probe for one accum mode's lower+upper pair
    (sidecar fingerprint only; device/jax-version guards run in the child)."""
    import copy
    import json as _json
    import os

    aot = _load_aot_module()
    fp = _exec_fingerprint(aot)
    a = copy.copy(args)
    a.grad_accum = ga
    bs = args.batch_size or 8
    for kind in ("lower", "upper"):
        side = os.path.join(_exec_dir(), _exec_name(a, bs, kind)) + ".json"
        try:
            with open(side) as fh:
                if _json.load(fh).get("fingerprint") != fp:
                    return False
        except (OSError, ValueError):
            return False
    return True


def _stamp_path():
    import os

    return os.path.join(_root(), ".jax_cache", "FINGERPRINT.json")


def _cache_modes_warm():
    """ga modes whose jit-path compiles are known to be in .jax_cache for the
    CURRENT sources. A big jit_step entry alone proves some program was
    compiled here, not this one — round 4's stale-cache stage-A timeout came
    from trusting entry existence after a package edit; the jit child now
    stamps the cache with the source fingerprint when its compiles land
    (see _stamp_cache)."""
    import json as _json
    import os

    try:
        with open(_stamp_path()) as fh:
            stamp = _json.load(fh)
        if stamp.get("fingerprint") != _exec_fingerprint():
            return set()
        # cross-check the stamp against reality: the big (>50MB) step
        # executables must actually be present. A --save-exec run stamps its
        # modes but populates only ~2MB side entries (measured r4: AOT
        # .compile() does NOT write the big program into the persistent
        # cache — only real jit dispatch does), so without this check a
        # regen-only cache would claim warmth it doesn't have.
        big = any(
            e.name.startswith("jit_step") and e.stat().st_size > 50 * 1024 * 1024
            for e in os.scandir(os.path.dirname(_stamp_path()))
        )
        if not big:
            return set()
        return set(int(g) for g in stamp.get("modes", []))
    except (OSError, ValueError):
        return set()


def _stamp_cache(ga):
    """Record (atomically) that the current sources' ga-mode step pair was
    just compiled in this process with the persistent cache enabled."""
    import json as _json
    import os

    path = _stamp_path()
    fp = _exec_fingerprint()
    modes = set()
    try:
        with open(path) as fh:
            stamp = _json.load(fh)
        if stamp.get("fingerprint") == fp:
            modes = set(int(g) for g in stamp.get("modes", []))
    except (OSError, ValueError):
        pass
    modes.add(int(ga))
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".tmp", "w") as fh:
            _json.dump({"fingerprint": fp, "modes": sorted(modes)}, fh)
        os.replace(path + ".tmp", path)
    except OSError:
        pass


def build(args):
    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.models import (
        UNet2DConditionModel,
        UNetConfig,
        build_unet_spec,
        gate_layout_for_config,
        materialize_pruned,
        sd21_unet_config,
    )
    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
    from unlearn_ft_tpu.schedulers import DiffusionSchedule
    from unlearn_ft_tpu.training.optim import make_optimizer
    from unlearn_ft_tpu.training.steps import LossConfig, make_finetune_step, make_upper_step

    dtype = jnp.bfloat16 if not args.smoke else jnp.float32
    if args.smoke:
        cfg = UNetConfig(
            sample_size=8, block_out_channels=(16, 32), layers_per_block=2,
            num_attention_heads=(2, 4), cross_attention_dim=16, norm_num_groups=4,
            ff_gate_width=4, upcast_attention=False,
            down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
            up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
        )
        vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
        resolution, seq, xdim = 16, 7, 16
    else:
        cfg = sd21_unet_config()
        vae_cfg = VAEConfig()
        resolution, seq, xdim = args.resolution, 77, 1024

    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)

    # zeros-init via shape inference (no giant RNG graphs); throughput only
    teacher_mod = UNet2DConditionModel(spec, dtype=dtype)
    sample = jnp.zeros((1, resolution // 8 if not args.smoke else cfg.sample_size,
                        resolution // 8 if not args.smoke else cfg.sample_size,
                        cfg.in_channels), dtype)
    ctx = jnp.zeros((1, seq, xdim), dtype)
    t_shape = jax.eval_shape(
        lambda k: teacher_mod.init(k, sample, jnp.zeros((1,), jnp.int32), ctx), jax.random.PRNGKey(0)
    )["params"]
    rng = np.random.default_rng(0)
    teacher_params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), t_shape
    )

    arch = layout.random_arch_vector(args.keep_ratio, seed=0)
    student_spec, student_params = materialize_pruned(spec, layout, teacher_params, arch)
    # remat: the bilevel mix holds TWO AdamW states (+~4GB at 508M params);
    # per-block rematerialization buys back the activation memory on v5e-16GB
    student_mod = UNet2DConditionModel(
        student_spec, dtype=dtype, remat=args.remat, remat_policy=args.remat_policy
    )

    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    v_shape = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, resolution, resolution, 3), dtype), k),
        jax.random.PRNGKey(0),
    )["params"]
    vae_params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), v_shape
    )

    sched = DiffusionSchedule()
    loss_cfg = LossConfig()
    # The bilevel mix holds TWO AdamW states over the 508M-param student;
    # per-chip HBM (16GB v5e) sets the optimizer-state precision choices:
    #   bf16  - both moments bf16, stochastic rounding (unbiased; see
    #           training/optim.py) — 2.0GB/state, admits the largest batch
    #   mixed - bf16 mu (deterministic) + fp32 nu — 3.05GB/state (28.97
    #           samples/s at batch 8 measured)
    #   fp32  - reference AdamW precision — 4.06GB/state; two states do not
    #           leave room for any batch on one chip (use ZeRO-1 sharding on
    #           a real mesh instead)
    prec = "fp32" if args.lower_only else args.opt_precision
    mu_dtype = jnp.bfloat16 if prec in ("bf16", "mixed") else None
    nu_dtype = jnp.bfloat16 if prec == "bf16" else None
    ga = max(1, int(getattr(args, "grad_accum", 1) or 1))
    tx = make_optimizer(1e-6, mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    # upper optimizer: reference bilevel config (unet_unlearning_learning_rate
    # 5e-6, configs/baselines/sd-2-1_coco_aptp_both_512_bilevel.yaml)
    upper_tx = make_optimizer(5e-6, mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    packed_specs = None
    fused = getattr(args, "fused_cadence", False)
    use_packed = getattr(args, "packed", False) and not fused
    use_packed_frozen = (getattr(args, "packed_frozen", False) and not fused
                         and not use_packed)
    if use_packed_frozen:
        # frozen-only packing: the teacher/VAE trees are read-only — no
        # repack write-back, only their ~900 buffers of dispatch bookkeeping
        # go away; the donated param/opt boundary stays per-leaf
        from unlearn_ft_tpu.utils.packing import make_pack_spec

        frozen_dt = jnp.float32 if args.smoke else jnp.bfloat16
        sds = lambda tree, dt: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(x.shape, dt), tree)
        thr = int(getattr(args, "pack_threshold", 2 * 1024 * 1024))
        frozen_spec = make_pack_spec({
            "teacher": sds(teacher_params, frozen_dt),
            "vae": sds(vae_params, frozen_dt),
        }, max_leaf_bytes=thr)
        packed_specs = {"frozen": frozen_spec}
        step = make_finetune_step(student_mod, teacher_mod, vae, sched, loss_cfg,
                                  tx, grad_accum=ga, frozen_spec=frozen_spec)
        upper_step = make_upper_step(student_mod, teacher_mod, vae, sched, loss_cfg,
                                     upper_tx, grad_accum=ga, frozen_spec=frozen_spec)
    elif use_packed:
        # flat-buffer step boundary: ~2500 arg leaves -> a handful of buffers
        # (measured ~9us/buffer dispatch bookkeeping through the v5e tunnel;
        # see utils/packing.py)
        from unlearn_ft_tpu.training.steps import (
            make_packed_finetune_step,
            make_packed_upper_step,
        )
        from unlearn_ft_tpu.utils.packing import make_pack_spec

        frozen_dt = jnp.float32 if args.smoke else jnp.bfloat16
        sds = lambda tree, dt: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(x.shape, dt), tree)
        # partial packing: leaves above the threshold ride through as
        # individual buffers — bounds the unpack/repack copies (full packing
        # of the 508M-param tree OOMed batch 8: ~+6GB of copies)
        thr = int(getattr(args, "pack_threshold", 2 * 1024 * 1024))
        p_sds = sds(student_params, jnp.float32)
        param_spec = make_pack_spec(p_sds, max_leaf_bytes=thr)
        opt_spec = make_pack_spec(jax.eval_shape(tx.init, p_sds), max_leaf_bytes=thr)
        upper_opt_spec = make_pack_spec(jax.eval_shape(upper_tx.init, p_sds),
                                        max_leaf_bytes=thr)
        frozen_spec = make_pack_spec({
            "teacher": sds(teacher_params, frozen_dt),
            "vae": sds(vae_params, frozen_dt),
        }, max_leaf_bytes=thr)
        packed_specs = {"param": param_spec, "opt": opt_spec,
                        "upper_opt": upper_opt_spec, "frozen": frozen_spec}
        step = make_packed_finetune_step(
            student_mod, teacher_mod, vae, sched, loss_cfg, tx,
            param_spec, opt_spec, frozen_spec, grad_accum=ga)
        upper_step = make_packed_upper_step(
            student_mod, teacher_mod, vae, sched, loss_cfg, upper_tx,
            param_spec, upper_opt_spec, frozen_spec, grad_accum=ga)
    else:
        step = make_finetune_step(student_mod, teacher_mod, vae, sched, loss_cfg,
                                  tx, grad_accum=ga)
        upper_step = make_upper_step(student_mod, teacher_mod, vae, sched, loss_cfg,
                                     upper_tx, grad_accum=ga)
    cadence_step = None
    if getattr(args, "fused_cadence", False):
        from unlearn_ft_tpu.training.steps import make_bilevel_cadence_step

        cadence_step = make_bilevel_cadence_step(
            student_mod, teacher_mod, vae, sched, loss_cfg, tx, upper_tx,
            lower_per_upper=10, grad_accum=ga,
        )

    n_t = sum(x.size for x in jax.tree.leaves(teacher_params))
    n_s = sum(np.asarray(x).size for x in jax.tree.leaves(student_params))
    print(f"# teacher {n_t/1e6:.0f}M params, student {n_s/1e6:.0f}M ({100*n_s/n_t:.0f}%)",
          file=sys.stderr)

    # analytic per-sample model FLOPs of the training mix, for MFU. MACs
    # tables come from the same utils/macs.py the resource loss uses;
    # FLOPs = 2*MACs; student backward = 2x forward (algorithmic MFU:
    # remat recompute is NOT counted). Lower step: teacher fwd + student
    # fwd/bwd; upper step (1 per 10 lower): 2B teacher fwd + student
    # fwd/bwd. VAE excluded in the precomputed-latents path.
    from unlearn_ft_tpu.utils import macs as macs_lib

    t_macs = macs_lib.unet_macs(spec, seq_kv=seq)["total"]
    s_macs = macs_lib.unet_macs(student_spec, seq_kv=seq)["total"]
    lower_flops = 2.0 * (t_macs + 3.0 * s_macs)
    upper_flops = 2.0 * (2.0 * t_macs + 3.0 * s_macs)
    flops_per_sample = lower_flops + upper_flops / 10.0
    if args.lower_only:
        flops_per_sample = lower_flops
    if args.in_loop_vae or args.smoke:
        # in-loop VAE FLOPs aren't in the analytic tables; smoke shapes are
        # not a 197-TFLOPs-peak device — either way MFU would mislead
        flops_per_sample = None
    return (step, upper_step, cadence_step), (tx, upper_tx), student_params, \
        teacher_params, vae_params, resolution, seq, xdim, flops_per_sample, \
        packed_specs


def run(args):
    import jax
    import jax.numpy as jnp

    if getattr(args, "exec_mode", "auto") == "load":
        # fail fast (before param construction + transfer) when the
        # serialized executables can't be used — the staged parent then
        # falls back to the jit stages with the budget intact
        if not _exec_artifacts_fresh(args, max(1, int(args.grad_accum or 1))):
            print("# --exec load: no fresh serialized executables for this "
                  "configuration (regenerate with --save-exec)", file=sys.stderr)
            raise SystemExit(3)

    (step, upper_step, cadence_step), (tx, upper_tx), student_params, teacher_params, \
        vae_params, resolution, seq, xdim, flops_per_sample, packed_specs = build(args)

    # largest-first; first success wins. The bilevel mix holds two AdamW
    # states over the 508M-param student: measured ceiling on one 16GB v5e
    # chip is batch 8 (12/16 OOM in round 2), so don't waste a ~5-min
    # compile on them. Lower-only (one state) fits batch 16 (35.9 s/s r1).
    if args.batch_size:
        batch_sizes = [args.batch_size]
    elif args.smoke:
        batch_sizes = [2]
    elif args.lower_only:
        batch_sizes = [16, 8, 4]
    else:
        # two-state bilevel ceiling on one 16GB chip: batch 8. Batch 12
        # re-probed in round 3 after the fused-upper-step change — still
        # OOMs (the 2B=24 teacher forward peaks higher); pass
        # --batch-size 12 to re-probe after memory work.
        batch_sizes = [8, 4]
    rng = np.random.default_rng(1)
    best = None
    mfu = None
    frozen_dtype = jnp.float32 if args.smoke else jnp.bfloat16

    import ml_dtypes

    np_dtypes = {jnp.bfloat16: ml_dtypes.bfloat16, jnp.float32: np.float32}

    def put(tree, dtype):
        nd = np_dtypes.get(dtype, dtype)
        out = jax.device_put(jax.tree.map(lambda x: np.asarray(x).astype(nd), tree))
        jax.block_until_ready(out)
        return out

    print("# transferring params to device...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    if packed_specs is not None:
        # pack on host -> device_put a handful of bulk buffers (the per-leaf
        # transfer of the ~900-leaf frozen trees costs tunnel round trips)
        from unlearn_ft_tpu.utils.packing import pack, pack_host, unpack

        frozen = jax.device_put(pack_host(
            {"teacher": teacher_params, "vae": vae_params},
            packed_specs["frozen"],
        ))
        jax.block_until_ready(frozen)
    else:
        frozen = {
            "teacher": put(teacher_params, frozen_dtype),
            "vae": put(vae_params, frozen_dtype),
        }
    print(f"# transfer done in {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    for bs in batch_sizes:
        try:
            # student params live on host between batch sizes (the step
            # donates them; an extra device-resident master copy OOMs)
            if packed_specs is not None and "param" in packed_specs:
                pspec = packed_specs["param"]
                params = jax.device_put(pack_host(student_params, pspec))
                opt_state = jax.jit(
                    lambda fp: pack(tx.init(unpack(fp, pspec)), packed_specs["opt"])
                )(params)
                upper_opt_state = None if args.lower_only else jax.jit(
                    lambda fp: pack(upper_tx.init(unpack(fp, pspec)),
                                    packed_specs["upper_opt"])
                )(params)
            else:
                params = put(student_params, np.float32)
                opt_state = tx.init(params)
                upper_opt_state = None if args.lower_only else upper_tx.init(params)
            if args.precomputed_latents:
                lat = resolution // 8 if not args.smoke else 8
                batch = {
                    "latent_moments": jnp.asarray(
                        rng.standard_normal((bs, lat, lat, 8)), jnp.float32
                    ),
                    "prompt_embeds": jnp.asarray(
                        rng.standard_normal((bs, seq, xdim)), jnp.float32
                    ),
                }
            else:
                batch = {
                    "pixel_values": jnp.asarray(
                        rng.standard_normal((bs, resolution, resolution, 3)), jnp.float32
                    ),
                    "prompt_embeds": jnp.asarray(
                        rng.standard_normal((bs, seq, xdim)), jnp.float32
                    ),
                }
            ga = max(1, int(getattr(args, "grad_accum", 1) or 1))
            if ga > 1:
                # [accum, batch, ...] microbatch axis: same data each micro —
                # throughput is data-independent; effective batch = bs*accum
                batch = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (ga,) + x.shape), batch
                )
            if cadence_step is not None and not args.lower_only:
                # fused mode: ONE dispatch per 10-lower+1-upper cadence
                lower_batches = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (10,) + x.shape), batch
                )
                upper_batch = dict(batch)
                upper_batch["empty_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
                print(f"# compiling fused cadence at batch {bs}...", file=sys.stderr,
                      flush=True)
                tw = time.perf_counter()
                params, opt_state, upper_opt_state, lm, um = cadence_step(
                    params, opt_state, upper_opt_state, frozen, lower_batches,
                    upper_batch, jax.random.PRNGKey(0),
                )
                warm_loss = float(lm["loss"][-1])
                print(f"# compiled in {time.perf_counter()-tw:.1f}s "
                      f"(loss {warm_loss:.4f})", file=sys.stderr, flush=True)
                n_cad = max(1, args.steps // 10)
                t0 = time.perf_counter()
                for i in range(n_cad):
                    params, opt_state, upper_opt_state, lm, um = cadence_step(
                        params, opt_state, upper_opt_state, frozen, lower_batches,
                        upper_batch, jax.random.PRNGKey(i + 1),
                    )
                _ = float(lm["loss"][-1])  # single host fetch = full barrier
                _ = float(um["upper_loss"])
                dt = time.perf_counter() - t0
                sps = bs * ga * 10 * n_cad / dt
                print(f"# batch {bs}x{ga} fused bilevel cadence: {sps:.3f} samples/sec "
                      f"({dt/(n_cad*10)*1e3:.1f} ms/lower-step incl. upper share)",
                      file=sys.stderr)
                if best is None or sps > best:
                    best = sps
                    if flops_per_sample is not None:
                        mfu = sps * flops_per_sample / 197e12
                        print(f"# MFU {100*mfu:.1f}% "
                              f"({flops_per_sample/1e12:.2f} TFLOPs/sample analytic)",
                              file=sys.stderr)
                break
            # warmup/compile. NOTE: host value fetches (float()) are used as
            # the sync barrier — on the experimental axon platform,
            # block_until_ready returns before remote execution finishes.
            if not args.lower_only:
                upper_batch = dict(batch)
                upper_batch["empty_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
            # serialized-executable fast path: load (or --save-exec: AOT
            # compile+persist) the step executables — removes the ~220s/step
            # trace+lower AND the compile from this process (utils/aot.py)
            used_exec = False
            exec_ok = (
                getattr(args, "exec_mode", "auto") != "off"
                and not args.smoke
                and not args.lower_only
                and not getattr(args, "fused_cadence", False)
                and packed_specs is None
            )
            if exec_ok:
                import os

                from unlearn_ft_tpu.utils.aot import load_executable, save_executable

                fp = _exec_fingerprint()
                p_lower = os.path.join(_exec_dir(), _exec_name(args, bs, "lower"))
                p_upper = os.path.join(_exec_dir(), _exec_name(args, bs, "upper"))
                if getattr(args, "save_exec", False):
                    print(f"# AOT-compiling + serializing step executables "
                          f"(ga={ga}, b={bs})...", file=sys.stderr, flush=True)
                    tw = time.perf_counter()
                    # trace/lower sequentially (Python-bound, holds the GIL),
                    # then compile both in two threads: XLA compilation
                    # releases the GIL, so the pair costs max instead of sum
                    # (same overlap as --parallel-precompile, ~635s vs ~930s
                    # cold); .compile() also populates the persistent cache
                    import concurrent.futures as cf

                    lw = step.lower(params, opt_state, frozen, batch,
                                    jax.random.PRNGKey(0))
                    uw = upper_step.lower(params, upper_opt_state, frozen,
                                          upper_batch, jax.random.PRNGKey(0))
                    with cf.ThreadPoolExecutor(2) as ex:
                        step, upper_step = list(
                            ex.map(lambda l: l.compile(), (lw, uw)))
                    del lw, uw
                    save_executable(p_lower, step, fingerprint=fp)
                    save_executable(p_upper, upper_step, fingerprint=fp)
                    print(f"# serialized in {time.perf_counter()-tw:.1f}s "
                          f"-> {_exec_dir()}", file=sys.stderr, flush=True)
                    used_exec = True
                else:
                    tw = time.perf_counter()
                    ex_l = load_executable(p_lower, fingerprint=fp, verbose=True)
                    ex_u = load_executable(p_upper, fingerprint=fp, verbose=True)
                    if ex_l is not None and ex_u is not None:
                        step, upper_step = ex_l, ex_u
                        used_exec = True
                        print(f"# loaded serialized step executables in "
                              f"{time.perf_counter()-tw:.2f}s (no trace, no "
                              f"compile)", file=sys.stderr, flush=True)
                    elif getattr(args, "exec_mode", "auto") == "load":
                        print("# --exec load: executables missing or stale; "
                              "regenerate with --save-exec", file=sys.stderr)
                        raise SystemExit(3)
            if (not args.lower_only and not used_exec
                    and getattr(args, "parallel_precompile", False)):
                # overlap the two cold compiles: XLA compilation releases
                # the GIL, so AOT-compiling lower+upper in two threads costs
                # max(644s, 285s) instead of their sum from a cold cache
                # (measured r4: 634.8s); .compile() populates the persistent
                # cache, so the real calls below load the executables in
                # seconds. OPT-IN (--parallel-precompile): AOT .compile()
                # does not READ the persistent cache, so on a warm cache
                # this would re-pay the full compile — the staged runner
                # enables it only when the cache looks cold.
                try:
                    import concurrent.futures as cf

                    print(f"# precompiling lower+upper steps at batch {bs} "
                          f"(parallel)...", file=sys.stderr, flush=True)
                    tw = time.perf_counter()
                    lw = step.lower(params, opt_state, frozen, batch,
                                    jax.random.PRNGKey(0))
                    uw = upper_step.lower(params, upper_opt_state, frozen,
                                          upper_batch, jax.random.PRNGKey(0))
                    with cf.ThreadPoolExecutor(2) as ex:
                        list(ex.map(lambda l: l.compile(), (lw, uw)))
                    del lw, uw
                    print(f"# precompiled in {time.perf_counter()-tw:.1f}s",
                          file=sys.stderr, flush=True)
                except Exception as e:  # fall back to sequential first-call
                    print(f"# parallel precompile failed "
                          f"({type(e).__name__}: {str(e)[:120]}); compiling "
                          f"sequentially", file=sys.stderr, flush=True)
            verb = "warming up" if used_exec else "compiling"
            print(f"# {verb} lower step at batch {bs}...", file=sys.stderr, flush=True)
            tw = time.perf_counter()
            params, opt_state, m = step(params, opt_state, frozen, batch, jax.random.PRNGKey(0))
            warm_loss = float(m["loss"])
            print(f"# compiled in {time.perf_counter()-tw:.1f}s (loss {warm_loss:.4f})",
                  file=sys.stderr, flush=True)
            if not args.lower_only:
                print(f"# {verb} upper step at batch {bs}...", file=sys.stderr, flush=True)
                tw = time.perf_counter()
                params, upper_opt_state, um = upper_step(
                    params, upper_opt_state, frozen, upper_batch, jax.random.PRNGKey(0)
                )
                print(f"# compiled in {time.perf_counter()-tw:.1f}s "
                      f"(upper loss {float(um['upper_loss']):.4f})",
                      file=sys.stderr, flush=True)
            if (not args.smoke and not args.lower_only and packed_specs is None
                    and (not used_exec or getattr(args, "save_exec", False))):
                # the compiles above just populated .jax_cache for this mode
                # (the exec-load path compiles nothing and is excluded):
                # stamp it so the staged parent trusts the cache only for
                # the exact current sources (see _cache_modes_warm)
                _stamp_cache(ga)
            n_steps = args.steps
            freq = 10  # reference training.upper_step_freq
            t0 = time.perf_counter()
            for i in range(n_steps):
                params, opt_state, m = step(
                    params, opt_state, frozen, batch, jax.random.PRNGKey(i + 1)
                )
                if not args.lower_only and (i + 1) % freq == 0:
                    params, upper_opt_state, um = upper_step(
                        params, upper_opt_state, frozen, upper_batch,
                        jax.random.PRNGKey(10_000 + i),
                    )
            # sync ONCE via a host value fetch of the LAST step's loss: it
            # data-depends on every prior step through the donated params
            # chain, so it is a complete barrier — while a per-step fetch
            # would idle the device for a tunnel round trip every step
            # (block_until_ready alone returns early on the axon platform).
            _ = float(m["loss"])
            if not args.lower_only:
                _ = float(um["upper_loss"])
            dt = time.perf_counter() - t0
            sps = bs * ga * n_steps / dt
            mode = "lower-only" if args.lower_only else f"bilevel (1 upper per {freq})"
            print(f"# batch {bs}x{ga} {mode}: {sps:.3f} samples/sec "
                  f"({dt/n_steps*1e3:.1f} ms/lower-step incl. upper share)",
                  file=sys.stderr)
            if best is None or sps > best:
                best = sps
                if flops_per_sample is not None:
                    # v5e peak: 197 TFLOP/s bf16 (densified MXU)
                    mfu = sps * flops_per_sample / 197e12
                    print(f"# MFU {100*mfu:.1f}% "
                          f"({flops_per_sample/1e12:.2f} TFLOPs/sample analytic)",
                          file=sys.stderr)
            break  # largest-first: first fitting batch size is the answer
        except Exception as e:  # OOM at large batch: fall through to smaller
            print(f"# batch {bs} failed: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            # free this attempt's device buffers before retrying — stale
            # params/opt-state references otherwise stay resident and turn a
            # batch-16 OOM into cascading OOMs at every smaller batch
            params = opt_state = upper_opt_state = batch = upper_batch = None  # noqa: F841
            lower_batches = lm = um = None  # noqa: F841
            import gc

            gc.collect()
            continue
    if best is None:
        raise RuntimeError("all batch sizes failed")
    return best, mfu


def run_prune(args):
    """Pruning-stage throughput: one hypernet+quantizer step over the frozen
    gated U-Net (reference UnetPruner.step, trainer.py:1159-1321) at 512px.

    The hot graph is teacher forward (gates=1) + gated student forward +
    input-gradient backward (the U-Net is frozen, so no weight-grad matmuls —
    the backward only chases the gate path) + Sinkhorn/contrastive/resource
    losses + AdamW on the ~2M hypernet/quantizer params.
    """
    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.models import (
        UNet2DConditionModel, build_unet_spec, gate_layout_for_config, sd21_unet_config,
    )
    from unlearn_ft_tpu.models.hypernet import HyperStructure
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
    from unlearn_ft_tpu.schedulers import DiffusionSchedule
    from unlearn_ft_tpu.training.optim import make_optimizer
    from unlearn_ft_tpu.training.steps import LossConfig, make_pruner_step
    from unlearn_ft_tpu.utils import macs as macs_lib

    sdxl = getattr(args, "model", "sd") == "sdxl"
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    if args.smoke:
        from unlearn_ft_tpu.models import UNetConfig

        cfg = UNetConfig(
            sample_size=8, block_out_channels=(16, 32), layers_per_block=2,
            num_attention_heads=(2, 4), cross_attention_dim=16, norm_num_groups=4,
            ff_gate_width=4, upcast_attention=False,
            down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
            up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
            **({"addition_embed_type": "text_time",
                "projection_class_embeddings_input_dim": 32 + 6 * 8,
                "addition_time_embed_dim": 8} if sdxl else {}),
        )
        vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
        resolution, seq, xdim = 16, 7, 16
    elif sdxl:
        import dataclasses

        from unlearn_ft_tpu.models import sdxl_unet_config

        # pin the spec's sample_size to the bench resolution: the analytic
        # MACs table (and so MFU) is computed from the spec, and SDXL's
        # native sample_size is 128 (1024px)
        cfg = dataclasses.replace(sdxl_unet_config(), sample_size=args.resolution // 8)
        vae_cfg = VAEConfig()
        resolution, seq, xdim = args.resolution, 77, 2048
    else:
        cfg = sd21_unet_config()
        vae_cfg = VAEConfig()
        resolution, seq, xdim = args.resolution, 77, 1024
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    unet = UNet2DConditionModel(spec, dtype=dtype, remat=args.remat,
                            remat_policy=args.remat_policy)
    rng = np.random.default_rng(0)
    lat = resolution // 8 if not args.smoke else cfg.sample_size
    init_added = None
    if sdxl:
        init_added = {
            "text_embeds": jnp.zeros(
                (1, cfg.projection_class_embeddings_input_dim
                 - 6 * cfg.addition_time_embed_dim), dtype),
            "time_ids": jnp.zeros((1, 6), dtype),
        }
    u_shape = jax.eval_shape(
        lambda k: unet.init(
            k, jnp.zeros((1, lat, lat, cfg.in_channels), dtype),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, seq, xdim), dtype), layout.ones(1),
            added_cond=init_added,
        ), jax.random.PRNGKey(0),
    )["params"]
    unet_params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), u_shape
    )
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    v_shape = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, resolution, resolution, 3), dtype), k),
        jax.random.PRNGKey(0),
    )["params"]
    vae_params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), v_shape
    )

    hypernet = HyperStructure(layout, input_dim=768)
    hparams = hypernet.init(jax.random.PRNGKey(2), jnp.zeros((1, 768)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=8)
    qparams = qcfg.init_params(jax.random.PRNGKey(3))
    qstate = qcfg.init_state(qparams)
    table = macs_lib.unet_macs(spec, seq)
    qstate = qcfg.set_prunable_macs_template(
        qstate,
        [[v / table["prunable"] for v in sub] for sub in table["per_submodule_prunable"]],
    )

    sched = DiffusionSchedule()
    tx = make_optimizer(1e-3)  # reference hypernet_learning_rate

    import ml_dtypes

    frozen_np = np.float32 if args.smoke else ml_dtypes.bfloat16
    frozen_host = {
        "unet": jax.tree.map(lambda x: x.astype(frozen_np), unet_params),
        "vae": jax.tree.map(lambda x: x.astype(frozen_np), vae_params),
    }
    frozen_spec = None
    if getattr(args, "packed", False) and not sdxl:
        # the trainable hypernet/quantizer trees are tiny; the frozen gated
        # U-Net is the ~900-buffer dispatch cost (utils/packing.py)
        from unlearn_ft_tpu.utils.packing import make_pack_spec, pack_host

        thr = int(getattr(args, "pack_threshold", 2 * 1024 * 1024))
        frozen_spec = make_pack_spec(frozen_host, max_leaf_bytes=thr)
        frozen = jax.device_put(pack_host(frozen_host, frozen_spec))
    else:
        frozen = jax.device_put(frozen_host)
    if sdxl:
        from unlearn_ft_tpu.training.sdxl_pruner import make_sdxl_pruner_step

        step = make_sdxl_pruner_step(
            unet, hypernet, qcfg, vae, layout, spec, sched, LossConfig(), tx,
            seq_kv=seq,
        )
    else:
        step = make_pruner_step(
            unet, hypernet, qcfg, vae, layout, spec, sched, LossConfig(), tx,
            seq_kv=seq, frozen_spec=frozen_spec,
        )
    # teacher fwd + gated fwd + input-only backward (~1x fwd: frozen weights
    # contribute no dW matmuls) -> ~3 full-U-Net forwards of model FLOPs
    flops_per_sample = None if args.smoke else 2.0 * 3.0 * table["total"]
    best = mfu = None
    if args.batch_size:
        batch_sizes = [args.batch_size]
    elif args.smoke:
        batch_sizes = [2]
    elif sdxl:
        # frozen SDXL U-Net is ~5.1GB bf16 on the 16GB chip
        batch_sizes = [8, 4, 2]
    else:
        batch_sizes = [8, 4]
    for bs in batch_sizes:
        try:
            trainable = jax.device_put({"hypernet": hparams, "quantizer": qparams})
            opt_state = tx.init(trainable)
            qs = jax.device_put(qstate)
            batch = {
                "latent_moments": jnp.asarray(
                    rng.standard_normal((bs, lat, lat, 2 * cfg.in_channels)), jnp.float32
                ),
                "prompt_embeds": jnp.asarray(rng.standard_normal((bs, seq, xdim)), jnp.float32),
                "mpnet_embeddings": jnp.asarray(rng.standard_normal((bs, 768)), jnp.float32),
            }
            if sdxl:
                pooled_dim = (cfg.projection_class_embeddings_input_dim
                              - 6 * cfg.addition_time_embed_dim)
                batch["text_embeds"] = jnp.asarray(
                    rng.standard_normal((bs, pooled_dim)), jnp.float32)
                batch["time_ids"] = jnp.tile(jnp.asarray(
                    [resolution, resolution, 0, 0, resolution, resolution],
                    jnp.float32)[None], (bs, 1))
            print(f"# compiling pruner step at batch {bs}...", file=sys.stderr, flush=True)
            tw = time.perf_counter()
            trainable, opt_state, qs, m = step(
                trainable, opt_state, qs, frozen, batch, jax.random.PRNGKey(0)
            )
            print(f"# compiled in {time.perf_counter()-tw:.1f}s "
                  f"(loss {float(m['loss']):.4f})", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            for i in range(args.steps):
                trainable, opt_state, qs, m = step(
                    trainable, opt_state, qs, frozen, batch, jax.random.PRNGKey(i + 1)
                )
            _ = float(m["loss"])  # axon: host fetch is the only real barrier
            dt = time.perf_counter() - t0
            sps = bs * args.steps / dt
            print(f"# batch {bs} pruning: {sps:.3f} samples/sec "
                  f"({dt/args.steps*1e3:.1f} ms/step)", file=sys.stderr)
            best = sps
            if flops_per_sample is not None:
                mfu = sps * flops_per_sample / 197e12
                print(f"# MFU {100*mfu:.1f}% ({flops_per_sample/1e12:.2f} "
                      f"TFLOPs/sample analytic)", file=sys.stderr)
            break
        except Exception as e:
            print(f"# batch {bs} failed: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            trainable = opt_state = qs = batch = None  # noqa: F841
            import gc

            gc.collect()
            continue
    if best is None:
        raise RuntimeError("all batch sizes failed")
    return best, mfu


def run_prune_flux(args):
    """Flux pruning-stage throughput: one hypernet+quantizer step over the
    frozen gated Flux MMDiT (reference FluxPruner.step, trainer.py:1742-1940)
    — flow-match loss + contrastive + Sinkhorn + resource, AdamW on the
    ~4M trainable hypernet/quantizer params.

    Full Flux-dev is ~11.8B params — frozen bf16 alone (~24GB) exceeds one
    16GB v5e chip, so the default bench runs a depth-scaled config (same
    3072-wide blocks, 7 joint + 14 single = ~4.3B params) whose per-block
    compute is identical; MFU is the transferable number. `--flux-layers` /
    `--flux-single-layers` override (full scale needs a ZeRO/mesh run, which
    `__graft_entry__.dryrun_multichip` compiles).
    """
    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.models.flux import (
        FluxConfig, GatedFluxTransformer2DModel, flux_gate_layout, make_image_ids,
    )
    from unlearn_ft_tpu.models.hypernet import HyperStructure
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.schedulers import FlowMatchSchedule
    from unlearn_ft_tpu.training.optim import make_optimizer
    from unlearn_ft_tpu.training.steps import LossConfig, make_flux_pruner_step
    from unlearn_ft_tpu.utils import flux_macs as fm

    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    if args.smoke:
        cfg = FluxConfig(in_channels=8, num_layers=2, num_single_layers=2,
                         attention_head_dim=8, num_attention_heads=2,
                         joint_attention_dim=16, pooled_projection_dim=16,
                         axes_dims_rope=(2, 2, 4), ff_gate_width=2)
        l_img, l_txt = 16, 4
    else:
        # guidance_embeds=True + a guidance vector: the reference Flux-dev
        # pruning run's configuration (trainer.py:1792-1798)
        cfg = FluxConfig(num_layers=args.flux_layers,
                         num_single_layers=args.flux_single_layers,
                         guidance_embeds=True)
        # 512px -> 64x64 latent -> 2x2-packed 32x32 = 1024 image tokens;
        # T5 text tokens at the reference Flux cap (max_sequence_length 512)
        packed_side = args.resolution // 16
        l_img, l_txt = packed_side * packed_side, 512
    layout = flux_gate_layout(cfg)
    flux = GatedFluxTransformer2DModel(cfg, dtype=dtype, remat=args.remat,
                                       remat_policy=args.remat_policy)

    rng = np.random.default_rng(0)
    # make_image_ids takes the PRE-packing latent side (= 2x the packed
    # side): (latent_side//2)**2 packed tokens
    latent_side = int(2 * np.sqrt(l_img))
    f_shape = jax.eval_shape(
        lambda k: flux.init(
            k, jnp.zeros((1, l_img, cfg.in_channels), dtype),
            jnp.zeros((1, l_txt, cfg.joint_attention_dim), dtype),
            jnp.zeros((1, cfg.pooled_projection_dim), dtype),
            jnp.zeros((1,), dtype), jnp.asarray(make_image_ids(latent_side, latent_side, 1)),
            jnp.zeros((1, l_txt, 3)), None, layout.ones(1),
        ), jax.random.PRNGKey(0),
    )["params"]
    # pooled fill: per-leaf float64 standard_normal for 4.3B params costs
    # ~10+ min host-side; throughput is weight-independent, so tile a 1M
    # random pool instead (realistic magnitudes, no denormal/NaN slowdowns)
    pool = (rng.standard_normal(1 << 20) * 0.02).astype(np.float32)

    def fill(s):
        n = int(np.prod(s.shape))
        reps = -(-n // pool.size)
        return np.tile(pool, reps)[:n].reshape(s.shape)

    flux_params = jax.tree.map(fill, f_shape)
    n_p = sum(np.asarray(x).size for x in jax.tree.leaves(flux_params))
    print(f"# gated flux: {n_p/1e9:.2f}B params "
          f"({cfg.num_layers} joint + {cfg.num_single_layers} single)",
          file=sys.stderr)
    if not args.smoke and (cfg.num_layers, cfg.num_single_layers) != (19, 38):
        # per-chip HBM math for the FULL Flux-dev config (19+38) under
        # parallel.shard_frozen (FSDP-sharded frozen tower; validated by
        # __graft_entry__.dryrun_multichip at full depth / reduced width).
        # eval_shape = pure tracing: exact param count, no allocation.
        import dataclasses

        full_cfg = dataclasses.replace(cfg, num_layers=19, num_single_layers=38)
        full_flux = GatedFluxTransformer2DModel(full_cfg, dtype=dtype)
        full_shape = jax.eval_shape(
            lambda k: full_flux.init(
                k, jnp.zeros((1, l_img, full_cfg.in_channels), dtype),
                jnp.zeros((1, l_txt, full_cfg.joint_attention_dim), dtype),
                jnp.zeros((1, full_cfg.pooled_projection_dim), dtype),
                jnp.zeros((1,), dtype),
                jnp.asarray(make_image_ids(latent_side, latent_side, 1)),
                jnp.zeros((1, l_txt, 3)),
                jnp.zeros((1,), dtype) if full_cfg.guidance_embeds else None,
                flux_gate_layout(full_cfg).ones(1),
            ), jax.random.PRNGKey(0),
        )["params"]
        n_full = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(full_shape))
        gb = n_full * 2 / 2**30  # bf16
        print(f"# full Flux-dev (19+38): {n_full/1e9:.2f}B params, "
              f"{gb:.1f}GB bf16 frozen -> with parallel.shard_frozen: "
              f"{gb/8:.2f}GB/chip on v5e-8, {gb/16:.2f}GB/chip on v5e-16 "
              f"(vs 16GB HBM/chip)", file=sys.stderr)

    hypernet = HyperStructure(layout, input_dim=768)
    hparams = hypernet.init(jax.random.PRNGKey(2), jnp.zeros((1, 768)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=8)
    qparams = qcfg.init_params(jax.random.PRNGKey(3))
    qstate = qcfg.init_state(qparams)
    table = fm.flux_macs(cfg, l_img, l_txt)
    qstate = qcfg.set_prunable_macs_template(
        qstate,
        [[v / table["prunable"] for v in sub] for sub in table["per_submodule_prunable"]],
    )

    tx = make_optimizer(1e-3)
    step = make_flux_pruner_step(
        flux, hypernet, qcfg, layout, cfg, FlowMatchSchedule(), LossConfig(), tx,
        l_img, l_txt,
    )

    import ml_dtypes

    frozen_np = np.float32 if args.smoke else ml_dtypes.bfloat16
    frozen = jax.device_put(
        {"flux": jax.tree.map(lambda x: x.astype(frozen_np), flux_params)}
    )
    jax.block_until_ready(frozen)
    # gated fwd + input-gradient bwd through the frozen net (~1x fwd: no dW
    # matmuls) -> ~2 full-transformer forwards of model FLOPs per sample.
    # UNDERcounts slightly: the attention-score backward still needs
    # dQ/dK/dV (~2x the forward attention matmuls at L=1536), and remat
    # recompute (--remat default on) is not counted — algorithmic MFU,
    # so the printed MFU is a floor.
    flops_per_sample = None if args.smoke else 2.0 * 2.0 * table["total"]
    best = mfu = None
    if args.batch_size:
        batch_sizes = [args.batch_size]
    elif args.smoke:
        batch_sizes = [2]
    else:
        batch_sizes = [8, 4, 2]
    for bs in batch_sizes:
        try:
            trainable = jax.device_put({"hypernet": hparams, "quantizer": qparams})
            opt_state = tx.init(trainable)
            qs = jax.device_put(qstate)
            batch = {
                "latents": jnp.asarray(
                    rng.standard_normal((bs, l_img, cfg.in_channels)), jnp.float32),
                "prompt_embeds": jnp.asarray(
                    rng.standard_normal((bs, l_txt, cfg.joint_attention_dim)),
                    jnp.float32),
                "pooled_prompt_embeds": jnp.asarray(
                    rng.standard_normal((bs, cfg.pooled_projection_dim)), jnp.float32),
                "img_ids": jnp.asarray(make_image_ids(latent_side, latent_side, bs)),
                "txt_ids": jnp.zeros((bs, l_txt, 3)),
                "mpnet_embeddings": jnp.asarray(
                    rng.standard_normal((bs, 768)), jnp.float32),
            }
            print(f"# compiling flux pruner step at batch {bs}...",
                  file=sys.stderr, flush=True)
            tw = time.perf_counter()
            trainable, opt_state, qs, m = step(
                trainable, opt_state, qs, frozen, batch, jax.random.PRNGKey(0)
            )
            print(f"# compiled in {time.perf_counter()-tw:.1f}s "
                  f"(loss {float(m['loss']):.4f})", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            for i in range(args.steps):
                trainable, opt_state, qs, m = step(
                    trainable, opt_state, qs, frozen, batch, jax.random.PRNGKey(i + 1)
                )
            _ = float(m["loss"])  # axon: host fetch is the only real barrier
            dt = time.perf_counter() - t0
            sps = bs * args.steps / dt
            print(f"# batch {bs} flux pruning: {sps:.3f} samples/sec "
                  f"({dt/args.steps*1e3:.1f} ms/step)", file=sys.stderr)
            best = sps
            if flops_per_sample is not None:
                mfu = sps * flops_per_sample / 197e12
                print(f"# MFU {100*mfu:.1f}% ({flops_per_sample/1e12:.2f} "
                      f"TFLOPs/sample analytic)", file=sys.stderr)
            break
        except Exception as e:
            print(f"# batch {bs} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            trainable = opt_state = qs = batch = None  # noqa: F841
            import gc

            gc.collect()
            continue
    if best is None:
        raise RuntimeError("all batch sizes failed")
    return best, mfu


def run_gen(args):
    """512px generation throughput: 25-step DDIM CFG on the pruned expert
    (tiny shapes under --smoke)."""
    import jax
    import jax.numpy as jnp

    from unlearn_ft_tpu.models import (
        UNet2DConditionModel, UNetConfig, build_unet_spec, gate_layout_for_config,
        materialize_pruned, sd21_unet_config,
    )
    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
    from unlearn_ft_tpu.pipelines import SDPipeline
    from unlearn_ft_tpu.schedulers import DiffusionSchedule

    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    if args.smoke:
        cfg = UNetConfig(
            sample_size=8, block_out_channels=(16, 32), layers_per_block=2,
            num_attention_heads=(2, 4), cross_attention_dim=16, norm_num_groups=4,
            ff_gate_width=4, upcast_attention=False,
            down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
            up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
        )
        vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
        resolution, seq, xdim, steps = 16, 7, 16, 2
    else:
        cfg = sd21_unet_config()
        vae_cfg = VAEConfig()
        resolution, seq, xdim, steps = args.resolution, 77, 1024, 25
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    rng = np.random.default_rng(0)
    teacher = UNet2DConditionModel(spec, dtype=dtype)
    lat = resolution // 8 if not args.smoke else cfg.sample_size
    t_shape = jax.eval_shape(
        lambda k: teacher.init(
            k, jnp.zeros((1, lat, lat, cfg.in_channels), dtype),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, seq, xdim), dtype),
        ), jax.random.PRNGKey(0),
    )["params"]
    full_params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), t_shape
    )
    sspec, sparams = materialize_pruned(
        spec, layout, full_params, layout.random_arch_vector(args.keep_ratio, seed=0)
    )
    student = UNet2DConditionModel(sspec, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    v_shape = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, resolution, resolution, 3), dtype), k),
        jax.random.PRNGKey(0),
    )["params"]
    vparams = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), v_shape
    )
    # inference holds no fp32 master copy: bf16 params halve the weight HBM
    # and spare the loop any fp32->bf16 convert the compiler fails to hoist
    import ml_dtypes

    np_dt = np.float32 if args.smoke else ml_dtypes.bfloat16
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x).astype(np_dt), t)  # noqa: E731
    pipe = SDPipeline(student, jax.device_put(cast(sparams)), vae,
                      jax.device_put(cast(vparams)),
                      DiffusionSchedule(), scheduler_type="ddim")
    bs = args.batch_size or (2 if args.smoke else 16)  # b16 = 3.44 img/s vs b8 = 2.88
    pe = jnp.asarray(rng.standard_normal((bs, seq, xdim)), jnp.float32)
    empty = jnp.zeros_like(pe)
    # warmup (compile), then timed. uint8 output = the production FID path
    # (device-side quantize; the device->host tunnel fetch is 4x smaller)
    pipe.generate_samples(pe, empty, steps, 7.5, resolution, resolution, 0,
                          output_uint8=True)
    t0 = time.perf_counter()
    n_rounds = 3
    for i in range(n_rounds):
        imgs = pipe.generate_samples(
            pe, empty, steps, 7.5, resolution, resolution, i + 1, output_uint8=True
        )
    dt = time.perf_counter() - t0
    ips = bs * n_rounds / dt
    mfu = None
    if not args.smoke:
        # denoise-loop FLOPs only (CFG doubles the batch: 2 student fwds per
        # step); the VAE decode (~1 fwd per 25-step loop) is not in the
        # analytic tables, so this slightly UNDERcounts — mfu is a floor
        from unlearn_ft_tpu.utils import macs as macs_lib

        s_macs = macs_lib.unet_macs(sspec, seq_kv=seq)["total"]
        flops_per_image = 2.0 * s_macs * 2.0 * steps
        mfu = ips * flops_per_image / 197e12
        print(f"# gen MFU >= {100*mfu:.1f}% ({flops_per_image/1e12:.2f} "
              f"TFLOPs/image denoise-only)", file=sys.stderr)
    return ips, mfu


def _run_staged(args):
    """Default bilevel mode: two time-budgeted stages, each a subprocess so
    (a) a hard driver timeout mid-stage-B cannot erase stage A's JSON line,
    (b) each stage gets exclusive use of the single TPU chip, and (c) the
    parent never initializes JAX. See the module docstring."""
    import os
    import subprocess

    budget = float(os.environ.get("BENCH_BUDGET_S", "1000"))
    t_start = time.time()
    passthrough = [
        "--resolution", str(args.resolution),
        "--keep-ratio", str(args.keep_ratio),
        "--steps", str(args.steps),
        "--opt-precision", args.opt_precision,
    ]
    if args.batch_size:
        passthrough += ["--batch-size", str(args.batch_size)]
    if not args.remat:
        passthrough += ["--no-remat"]
    if args.remat_policy:
        passthrough += ["--remat-policy", args.remat_policy]
    # per-mode warm/cold decision via the source-fingerprint stamp the jit
    # child writes into .jax_cache when its compiles land: a big jit_step
    # entry alone proves SOME program was compiled here, not THIS one —
    # round 4's stale-cache stage-A timeout (880s inside one sequential
    # cold compile, rc=1, zero JSON lines) came from trusting entry
    # existence after a package edit. Cold modes get --parallel-precompile
    # (~635s overlapped vs ~930s sequential); warm modes read the cache in
    # seconds through plain jit (AOT precompile would re-pay the compile).
    try:
        warm_modes = _cache_modes_warm()
    except Exception as e:  # never let the probe kill the bench
        print(f"# cache stamp probe failed ({type(e).__name__}: "
              f"{str(e)[:120]}); assuming cold", file=sys.stderr, flush=True)
        warm_modes = set()
    print(f"# .jax_cache fingerprint-warm accum modes: "
          f"{sorted(warm_modes) or 'none'}", file=sys.stderr, flush=True)

    def _stage_extra(ga):
        extra = ["--grad-accum", str(ga)]
        if ga not in warm_modes:
            extra += ["--parallel-precompile"]
        return extra

    # Stage F: serialized-executable fast path. One child measures BOTH
    # accum modes with zero trace/compile cost, writing its JSON lines
    # DIRECTLY to the shared stdout — a driver kill at any later point
    # cannot erase a line that already landed. Attempted only when the
    # artifacts' source fingerprint is fresh (checked JAX-free here).
    #
    # Cost anatomy (measured r4): transfer ~20-60s + deserialize/load
    # ~75-81s + the axon PER-PROCESS first-dispatch stall + measurement.
    # The stall is the variable part (7-440s normally; 1163s on one
    # degraded night) and is paid ONCE per process, not per executable —
    # the second loaded executable's first call measured 0.2s. Every
    # strategy pays that same stall before its first step (the jit stages
    # pay it PLUS trace+compile), so stage F gets nearly the whole budget;
    # the jit stages are the fallback only for FAST failures (stale
    # artifacts rc=3, OOM) where budget remains.
    try:
        fast_ok = any(_exec_artifacts_fresh(args, ga) for ga in (1, 2))
    except Exception as e:  # never let the probe kill the bench
        print(f"# exec freshness probe failed ({type(e).__name__}: "
              f"{str(e)[:120]}); skipping stage F", file=sys.stderr, flush=True)
        fast_ok = False
    if fast_ok:
        cmd = [sys.executable, os.path.abspath(__file__)] + passthrough + \
            ["--exec", "load"]
        try:
            # only a thin reserve: if stage F times out it is almost always
            # the first-dispatch stall, and the jit fallback would stall too
            res = subprocess.run(
                cmd, timeout=max(120.0, budget - (time.time() - t_start) - 30.0))
            if res.returncode == 0:
                return  # lines already on stdout; best was printed last
            print(f"# stage F failed rc={res.returncode}; falling back to "
                  f"jit stages", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print("# stage F timed out; any lines it printed still stand — "
                  "falling back to jit stages", file=sys.stderr, flush=True)
        time.sleep(15)  # let the chip release the fast child's allocations
    else:
        print("# no fresh serialized executables (.jax_exec); using jit "
              "stages", file=sys.stderr, flush=True)

    def stage(extra, timeout):
        cmd = [sys.executable, os.path.abspath(__file__)] + passthrough + extra
        try:  # stderr inherits: compile progress stays visible in the log
            res = subprocess.run(cmd, stdout=subprocess.PIPE, timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"# stage {extra} timed out after {timeout:.0f}s",
                  file=sys.stderr, flush=True)
            return None
        if res.returncode != 0:
            print(f"# stage {extra} failed rc={res.returncode}",
                  file=sys.stderr, flush=True)
            return None
        for line in reversed(res.stdout.decode().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        return None

    # Stage A: accum 1 — the round-2 driver-verified mode (~700s cold,
    # ~3 min warm). Its JSON line prints the moment it lands. Timeout is
    # whatever is left of the budget (stage F may have consumed some).
    # budget split: when ga1 is cache-warm, reserve time for a retry and
    # stage B; when cold, the parallel-precompile path needs ~810s end-to-end
    # (r2/r4 measured) — give it everything but a small slack, and don't
    # plan on stage B (a second cold compile can't fit the same budget).
    reserve_a = 120.0 if 1 in warm_modes else 45.0
    out_a = stage(_stage_extra(1),
                  timeout=max(60.0, budget - (time.time() - t_start) - reserve_a))
    if out_a is not None:
        print(json.dumps(out_a), flush=True)
    remaining = budget - (time.time() - t_start) - 60.0
    if out_a is None:
        # one retry of the cheap mode: stale remote allocations from a
        # crashed attempt clear after ~1 min (the chip holds a dead
        # client's buffers for a while)
        if remaining > 180:
            time.sleep(45)
            out_a = stage(_stage_extra(1),
                          timeout=max(60.0, remaining - 75.0))
            if out_a is not None:
                print(json.dumps(out_a), flush=True)
        if out_a is None:
            raise SystemExit(1)
        return  # the retry ate the budget: don't attempt stage B
    best = out_a
    if remaining > 400 and 2 in warm_modes:
        time.sleep(15)  # let the chip release stage A's allocations
        out_b = stage(_stage_extra(2), timeout=remaining - 30.0)
        if out_b is not None and out_b.get("value", 0) > best.get("value", 0):
            best = out_b
        elif out_b is not None:
            print(f"# stage B completed but not better "
                  f"({out_b.get('value')} <= {best.get('value')})",
                  file=sys.stderr)
    else:
        print(f"# skipping stage B: {remaining:.0f}s left of the "
              f"{budget:.0f}s budget (cold cache)", file=sys.stderr)
    # final line: the best result (the driver reads the last JSON line)
    print(json.dumps(best), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny shapes (CPU sanity)")
    p.add_argument("--gen", action="store_true",
                   help="measure 512px generation images/sec instead of training")
    p.add_argument("--prune", action="store_true",
                   help="measure the APTP pruning-stage step (hypernet+quantizer "
                        "training over the frozen gated U-Net) instead")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--keep-ratio", type=float, default=0.55)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--steps", type=int, default=40,
                   help="timed steps; 40 keeps run-to-run variance ~0.5%%")
    p.add_argument("--in-loop-vae", action="store_true",
                   help="encode pixels with the VAE inside the train step "
                        "(the reference's hot path; apples-to-apples mode)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=True,
                   help="gradient checkpointing on the student (needed for the "
                        "two-optimizer bilevel mix to fit 16GB HBM)")
    p.add_argument("--remat-policy", default=None,
                   choices=[None, "dots", "hires"],
                   help="what remat saves: None = replay whole blocks; dots = "
                        "save matmul outputs; hires = remat only the two "
                        "highest-resolution down/up levels")
    p.add_argument("--opt-precision", default="bf16",
                   choices=["bf16", "mixed", "fp32"],
                   help="bilevel optimizer-state precision: bf16 = both "
                        "moments bf16 w/ stochastic rounding; mixed = bf16 "
                        "mu + fp32 nu; fp32 = reference AdamW precision")
    p.add_argument("--fused-cadence", action="store_true",
                   help="run the whole 10-lower+1-upper cadence as ONE jitted "
                        "lax.scan program (one dispatch per cadence instead of "
                        "eleven; removes the per-step host launch gap)")
    p.add_argument("--lower-only", action="store_true",
                   help="measure the lower step alone (round-1 metric) instead "
                        "of the true 9-lower+1-upper bilevel cadence")
    p.add_argument("--grad-accum", type=int, default=None,
                   help="microbatches accumulated per optimizer update inside "
                        "the jitted step. Bilevel default: 2 — batch 8 x "
                        "accum 2 is the reference bilevel config's effective "
                        "batch 16/chip (and faster: fewer AdamW updates per "
                        "sample). Other modes default to 1.")
    p.add_argument("--packed", action=argparse.BooleanOptionalAction, default=False,
                   help="flat-buffer step boundary (utils/packing.py): pack the "
                        "~2500 param/opt/frozen leaf buffers into a few flat "
                        "per-dtype buffers and unpack inside the jitted step — "
                        "removes the ~9us/buffer per-dispatch bookkeeping "
                        "(~76ms/step at batch 8 x accum 2). Measured on v5e: "
                        "36.6 samples/s, 46.4%% MFU vs the tree boundary's "
                        "39.9 / 50.6%% — the unpack/repack HBM copies cost more "
                        "than the dispatch they save at this model size, so "
                        "the default is OFF (it wins only for step programs "
                        "that are dispatch-bound, e.g. much smaller models).")
    p.add_argument("--packed-frozen", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="pack ONLY the frozen teacher/VAE trees (~900 of the "
                        "~2500 step-boundary buffers): read-only, so no "
                        "repack write-back and the donated param/opt "
                        "boundary stays per-leaf — the cheap subset of "
                        "--packed")
    p.add_argument("--model", choices=["sd", "sdxl", "flux"], default="sd",
                   help="--prune only: which pruning trainer's step to bench "
                        "(sdxl = dual-tower 2048-d context + text_time "
                        "added_cond over the 2.6B-param gated SDXL U-Net; "
                        "flux = flow-match objective over a depth-scaled "
                        "gated Flux MMDiT — see run_prune_flux)")
    p.add_argument("--flux-layers", type=int, default=7,
                   help="--prune --model flux: joint MMDiT blocks (full "
                        "Flux-dev: 19 — frozen bf16 exceeds one 16GB chip)")
    p.add_argument("--flux-single-layers", type=int, default=14,
                   help="--prune --model flux: single-stream blocks (full: 38)")
    p.add_argument("--parallel-precompile", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="AOT-compile the lower+upper steps in two threads "
                        "before the timed run — cuts a COLD bilevel compile "
                        "from ~930s to ~635s, but re-pays the full compile "
                        "on a warm cache (AOT bypasses persistent-cache "
                        "reads); the staged default enables it per accum "
                        "mode when .jax_cache's fingerprint stamp is stale")
    p.add_argument("--pack-threshold", type=int, default=2 * 1024 * 1024,
                   help="only pack leaves up to this many bytes (larger ones "
                        "pass through as individual buffers); bounds the "
                        "unpack/repack HBM copies to ~0.3GB at the default")
    p.add_argument("--exec", dest="exec_mode", default="auto",
                   choices=["auto", "load", "off"],
                   help="serialized-executable fast path (.jax_exec/, "
                        "utils/aot.py): auto = use if fresh, else jit; "
                        "load = require (exit 3 if missing/stale — used by "
                        "the staged parent to fail fast); off = never. "
                        "Loading skips tracing AND compiling (~0.02s vs "
                        "~220s trace + compile per step on this host). "
                        "Without --grad-accum, --exec load measures BOTH "
                        "accum modes in one process (one attach stall).")
    p.add_argument("--save-exec", action="store_true",
                   help="AOT-compile the bilevel step pair at this "
                        "configuration and serialize it to .jax_exec/ "
                        "(consults the persistent compile cache, so a warm "
                        "regeneration costs one trace+lower per step). Run "
                        "with --grad-accum 1 and 2, then commit .jax_exec/.")
    args = p.parse_args()
    if (args.grad_accum is None and not args.smoke and not args.gen
            and not args.prune and not args.lower_only
            and args.exec_mode != "load"):
        # default bilevel mode: staged fast-path/accum-1/accum-2 (module
        # docstring). Runs in subprocesses; the parent stays JAX-free.
        _run_staged(args)
        return
    exec_both = (args.exec_mode == "load" and args.grad_accum is None
                 and not args.smoke and not args.gen and not args.prune
                 and not args.lower_only)
    if args.grad_accum is None:
        # explicit modes: gen/prune/lower-only stay at 1; --smoke bilevel
        # keeps the reference's effective batch 16 (batch x accum 2)
        args.grad_accum = 1 if (args.gen or args.prune or args.lower_only) else 2
    # production default: VAE posterior moments precomputed once per dataset
    # (identical training distribution; the encoder costs more FLOPs than the
    # teacher U-Net at 512px — measured 35.6 vs 29.0 samples/sec/chip)
    args.precomputed_latents = not args.in_loop_vae

    import os

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the 512px step compiled in ~327s in round
    # 1; warm re-runs (driver, sweeps) load the executable in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    if args.prune:
        if args.model == "flux":
            value, mfu = run_prune_flux(args)
        else:
            value, mfu = run_prune(args)
        prefix = "" if args.model == "sd" else f"{args.model}_"
        out = {
            "metric": f"{prefix}prune_train_samples_per_sec_per_chip",
            "value": round(float(value), 4),
            "unit": "samples/sec/chip",
            # per-model estimated torch-DDP A100 denominator (see
            # EST_BASELINE_PRUNE): the SD pruning step is the lower-step cost
            # class; SDXL/Flux steps are ~3x/~10x heavier per sample
            "vs_baseline": round(float(value) / EST_BASELINE_PRUNE[args.model], 4),
        }
        if mfu is not None:
            out["mfu"] = round(float(mfu), 4)
        print(json.dumps(out))
        return

    if args.gen:
        value, mfu = run_gen(args)
        out = {
            "metric": "gen_512px_images_per_sec",
            "value": round(float(value), 4),
            "unit": "images/sec/chip",
            "vs_baseline": round(float(value) / 1.0, 4),  # ~1 img/s/GPU reference est.
        }
        if mfu is not None:
            out["mfu"] = round(float(mfu), 4)  # denoise-only FLOPs: a floor
        print(json.dumps(out))
        return

    def _bilevel_line(value, mfu):
        out = {
            "metric": "bilevel_train_samples_per_sec_per_chip",
            "value": round(float(value), 4),
            "unit": "samples/sec/chip",
            "vs_baseline": round(float(value) / EST_REFERENCE_A100_SAMPLES_PER_SEC, 4),
        }
        if mfu is not None:
            # analytic-MACs-derived model FLOPs utilization vs 197 TFLOP/s
            # bf16 peak (v5e); remat recompute not counted (algorithmic MFU)
            out["mfu"] = round(float(mfu), 4)
        return out

    if exec_both:
        # serialized-executable fast child: measure accum-1 then accum-2 in
        # ONE process (one axon attach stall), printing each line directly
        # as it lands; re-print the best last (the driver reads the last
        # line). Fail fast per mode via run()'s --exec load precheck.
        import copy
        import gc

        # accum 2 (the headline 39.9) first: if the process is killed after
        # one mode, the better line is already banked on stdout
        modes = [ga for ga in (2, 1) if _exec_artifacts_fresh(args, ga)]
        if not modes:
            print("# --exec load: no fresh serialized executables "
                  "(regenerate with --save-exec)", file=sys.stderr)
            raise SystemExit(3)
        best = None
        for ga in modes:
            a = copy.copy(args)
            a.grad_accum = ga
            try:
                value, mfu = run(a)
            except SystemExit:
                raise
            except Exception as e:
                print(f"# exec mode ga={ga} failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
                continue
            line = _bilevel_line(value, mfu)
            print(json.dumps(line), flush=True)
            if best is None or line["value"] > best["value"]:
                best = line
            gc.collect()
        if best is None:
            raise SystemExit(1)
        print(json.dumps(best), flush=True)
        return

    value, mfu = run(args)
    print(json.dumps(_bilevel_line(value, mfu)))


if __name__ == "__main__":
    main()
