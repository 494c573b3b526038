"""Profile the bilevel lower/upper train step on the live backend.

Captures a jax.profiler trace of a few steps of the SAME step functions the
bench runs (bench.build), then parses the raw ``.xplane.pb`` (via
tensorflow.tsl's proto, shipped in the image) and prints the top device ops
by total self time. This is the timeline profiler the reference never had
(SURVEY.md §5: op_counter is MACs-only) — use it to find non-MXU time.

Usage:
    python scripts/profile_step.py [--steps 5] [--batch-size 8] [--upper]
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xspace(logdir, top=40):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no .xplane.pb produced — device tracing unsupported on this platform")
        return
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        is_device = "TPU" in plane.name or "/device:" in plane.name
        if not is_device:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        has_ops_line = any(l.name == "XLA Ops" for l in plane.lines)
        for line in plane.lines:
            # Keep ONLY the synchronous compute stream: "Steps"/"XLA Modules"
            # nest the same time, and "Async XLA Ops" durations are DMA
            # issue->done windows that overlap compute (exact name match —
            # "XLA Ops" is a substring of "Async XLA Ops")
            if has_ops_line and line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if not totals:
            continue
        total_ms = sum(totals.values())
        print(f"\n=== plane {plane.name}: {total_ms:.1f} ms busy over trace ===")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:9.2f} ms  {100*ms/total_ms:5.1f}%  x{counts[name]:<5d} {name[:110]}")


def group_report(logdir):
    """Second pass: bucket ops into fusion/conv/attention/etc. categories."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    buckets = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        has_ops_line = any(l.name == "XLA Ops" for l in plane.lines)
        for line in plane.lines:
            if has_ops_line and line.name != "XLA Ops":
                continue
            for ev in line.events:
                # bucket on the result name only — the full HLO text after
                # " = " mentions operand ops (slice, copy, ...) that would
                # mis-bucket fusions
                name = meta.get(ev.metadata_id, "?").split(" = ")[0].lower()
                ms = ev.duration_ps / 1e9
                if "flash" in name or "splash" in name or "attention" in name:
                    buckets["attention-kernel"] += ms
                elif "convolution" in name:
                    buckets["conv-fusion"] += ms
                elif "convert_reduce" in name or "multiply_reduce" in name:
                    buckets["reductions (norm stats/loss)"] += ms
                elif "all-reduce" in name or "all-gather" in name:
                    buckets["collective"] += ms
                elif "copy" in name or "slice" in name or "dynamic" in name:
                    buckets["copy/dma"] += ms
                elif "fusion" in name:
                    buckets["fusion (conv/matmul/elementwise)"] += ms
                else:
                    buckets["other"] += ms
    total = sum(buckets.values())
    if total:
        print("\n=== category summary ===")
        for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"{v:9.2f} ms  {100*v/total:5.1f}%  {k}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="profile the accumulated step ([accum, batch, ...] input)")
    p.add_argument("--packed", action="store_true",
                   help="profile the flat-buffer (packed-dispatch) step")
    p.add_argument("--upper", action="store_true", help="profile the upper step instead")
    p.add_argument("--logdir", default="/tmp/jax_step_trace")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()
    if args.parse_only:
        parse_xspace(args.logdir)
        group_report(args.logdir)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    import bench

    bargs = argparse.Namespace(
        smoke=args.smoke, resolution=512, keep_ratio=0.55, remat=True,
        remat_policy=None, lower_only=False, opt_precision="bf16",
        in_loop_vae=False, precomputed_latents=True, grad_accum=args.grad_accum,
        packed=args.packed,
    )
    (step, upper_step, _cad), (tx, upper_tx), student_params, teacher_params, vae_params, \
        resolution, seq, xdim, _, packed_specs = bench.build(bargs)

    import ml_dtypes

    def put(tree, dt):
        return jax.device_put(jax.tree.map(lambda x: np.asarray(x).astype(dt), tree))

    if packed_specs is not None:
        from unlearn_ft_tpu.utils.packing import pack, pack_host, unpack

        frozen = jax.device_put(pack_host(
            {"teacher": teacher_params, "vae": vae_params}, packed_specs["frozen"]))
        params = jax.device_put(pack_host(student_params, packed_specs["param"]))
        pspec = packed_specs["param"]
        opt_state = jax.jit(
            lambda fp: pack(tx.init(unpack(fp, pspec)), packed_specs["opt"])
        )(params)
    else:
        frozen_dt = np.float32 if args.smoke else ml_dtypes.bfloat16
        frozen = {"teacher": put(teacher_params, frozen_dt), "vae": put(vae_params, frozen_dt)}
        params = put(student_params, np.float32)
        opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    bs = args.batch_size if not args.smoke else 2
    lat = resolution // 8 if not args.smoke else 8
    batch = {
        "latent_moments": jnp.asarray(rng.standard_normal((bs, lat, lat, 8)), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.standard_normal((bs, seq, xdim)), jnp.float32),
    }
    if args.grad_accum > 1:
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (args.grad_accum,) + x.shape), batch
        )
    fn, state = (step, opt_state)
    if args.upper:
        if packed_specs is not None:
            ustate = jax.jit(
                lambda fp: pack(upper_tx.init(unpack(fp, packed_specs["param"])),
                                packed_specs["upper_opt"])
            )(params)
        else:
            ustate = upper_tx.init(params)
        fn, state = (upper_step, ustate)
        batch = dict(batch)
        batch["empty_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
    print("# warmup/compile...", file=sys.stderr, flush=True)
    params, state, m = fn(params, state, frozen, batch, jax.random.PRNGKey(0))
    _ = float(m[list(m.keys())[0]])
    print("# tracing...", file=sys.stderr, flush=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        params, state, m = fn(params, state, frozen, batch, jax.random.PRNGKey(i + 1))
    _ = float(m[list(m.keys())[0]])  # axon: host fetch is the only real barrier
    jax.profiler.stop_trace()
    parse_xspace(args.logdir)
    group_report(args.logdir)


if __name__ == "__main__":
    main()
