"""Per-fusion forward attribution table (VERDICT r4 weak #3).

The round-4 roofline said the flagship forward is memory-bound at 160.5 ms
(131.4 GB @ 819 GB/s) yet measures ~310 ms — 51.6% of the bound — with no
evidence of WHICH fusions run below bandwidth. This tool produces that
evidence:

* traces the compiled flagship forward with ``jax.profiler`` (works over the
  axon tunnel — device-side XLA Ops timeline),
* aggregates per-op device time across iterations from the trace's
  "XLA Ops" line,
* parses each op's HLO signature (the event name embeds every operand and
  output shape WITH its memory-space annotation) to estimate the op's HBM
  bytes: shape tokens whose layout carries ``S(n>=1)`` live in
  VMEM/SMEM (XLA memory-space assignment) and are skipped,
* prints the top-N table: ms/iter, GB/iter, achieved GB/s, % of HBM peak,
  cumulative time share — plus a category rollup (conv / matmul / other
  fusions / copies).

Env: MDE_BENCH_SHAPE (train|kitti_test|nyu), MDE_BENCH_BATCH, MDE_PROF_MODE
(fwd|train: ``train`` profiles the full value_and_grad+update step at
batch 4), MDE_PROF_TOPN, MDE_PROF_ITERS.
"""

import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

HBM_GBPS = {"v5 lite": 819e9, "v5e": 819e9, "v4": 1228e9, "v5p": 2765e9,
            "v6 lite": 1640e9, "v6e": 1640e9}

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
                "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8, "c64": 8, "c128": 16}

# dtype[dims]{layout}  (dims may be empty for scalars; layout may carry
# tile/space annotations like {1,0:T(8,128)(2,1)S(1)})
_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([0-9,]*)\](\{[^}]*\})?")
_SPACE_RE = re.compile(r"S\((\d+)\)")


def shape_bytes(tok_dtype: str, tok_dims: str, tok_layout: str):
    """(bytes, in_hbm) for one shape token."""
    if tok_dtype not in _DTYPE_BYTES:
        return 0, False
    n = 1
    if tok_dims:
        for d in tok_dims.split(","):
            n *= int(d)
    m = _SPACE_RE.search(tok_layout or "")
    in_hbm = not (m and int(m.group(1)) >= 1)
    return n * _DTYPE_BYTES[tok_dtype], in_hbm


def hlo_line_hbm_bytes(name: str) -> int:
    """Estimated HBM traffic of one op from its full HLO signature line:
    sum of output + operand shape tokens that live in the default memory
    space. Re-reads inside a fusion are not visible — this is the op's
    FOOTPRINT traffic, the same quantity the roofline uses."""
    total = 0
    for m in _SHAPE_RE.finditer(name):
        b, in_hbm = shape_bytes(m.group(1), m.group(2), m.group(3))
        if in_hbm:
            total += b
    return total


def op_key(name: str) -> str:
    """Aggregation key: the op's SSA name (before ' = ')."""
    return name.split(" = ", 1)[0].strip()


def categorize(name: str) -> str:
    base = op_key(name)
    if "conv" in base:
        return "conv-fusion"
    if re.search(r"\bdot\b|dot_general|%dot", name.split(" = ")[1][:400]
                 if " = " in name else name):
        return "matmul"
    if base.startswith("%copy") or "transpose" in base or "bitcast" in base:
        return "copy/relayout"
    if "reduce" in base:
        return "reduce"
    if "dynamic" in base or "slice" in base or "concatenate" in base \
            or "pad" in base or "gather" in base:
        return "slice/concat/pad"
    # only the OP ITSELF being a custom-call counts (an operand named
    # %custom-call.N must not reclassify a fusion)
    rhs = name.split(" = ", 1)[1] if " = " in name else name
    if "custom-call(" in rhs or "custom_call_target" in rhs:
        return "custom-call(pallas)"
    return "elementwise-fusion"


def collect(trace_dir: str):
    """-> {op_ssa_name: [durations_ns...]}, {op_ssa_name: full_hlo_line}.

    Container ops (while/conditional/call whose interval encloses other ops
    on the timeline) are SKIPPED so their children aren't double-counted —
    the leaf fusions inside a while body appear as their own events."""
    import jax
    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    durs, lines = defaultdict(list), {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for e in line.events:
                st = dict(e.stats)
                off = st.get("device_offset_ps", 0)
                dur = st.get("device_duration_ps", e.duration_ns * 1000)
                evs.append((off, off + dur, e.name, e.duration_ns))
            evs.sort()
            for i, (s0, e0, name, dns) in enumerate(evs):
                # container if the NEXT event starts inside this interval
                contains = (i + 1 < len(evs) and evs[i + 1][0] < e0
                            and evs[i + 1][1] <= e0)
                if contains:
                    continue
                k = op_key(name)
                durs[k].append(dns)
                lines[k] = name
    return durs, lines


_CALLS_RE = re.compile(r"calls=(%[\w.\-]+)")
_OPCODE_RE = re.compile(
    r"=\s+(?:[a-z]+\d*\[[0-9,]*\]\S*|\([^)]*\))\s+([a-z][\w\-]*)")


def fusion_compositions(hlo_text: str):
    """-> {fusion_ssa_name: 'opcode xN, ...'} summarizing each fused
    computation's body (identifies what %fusion.N actually computes)."""
    # computation name -> list of opcodes in its body
    comp_ops = {}
    cur = None
    for ln in hlo_text.splitlines():
        s = ln.strip()
        m = re.match(r"%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{$", s) \
            or re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", s)
        if s.endswith("{") and ("(" in s) and ("->" in s or s.startswith("%")):
            name = s.split("(", 1)[0].strip().lstrip("%").strip()
            cur = name.split()[-1] if name else None
            comp_ops[cur] = []
            continue
        if s == "}" or s.startswith("}"):
            cur = None
            continue
        if cur is not None and "=" in s:
            m2 = _OPCODE_RE.search(s)
            if m2:
                comp_ops[cur].append(m2.group(1))
    # fusion op -> calls target
    out = {}
    for ln in hlo_text.splitlines():
        s = ln.strip()
        if " fusion(" not in s and "fusion(" not in s:
            continue
        mk = s.split(" = ", 1)
        mc = _CALLS_RE.search(s)
        if len(mk) == 2 and mc:
            key = mk[0].strip()
            comp = mc.group(1).lstrip("%")
            ops = comp_ops.get(comp, [])
            cnt = defaultdict(int)
            for o in ops:
                if o in ("parameter", "constant", "tuple", "bitcast",
                         "get-tuple-element"):
                    continue
                cnt[o] += 1
            out[key] = ", ".join(f"{o} x{n}" if n > 1 else o
                                 for o, n in sorted(cnt.items(),
                                                    key=lambda kv: -kv[1])[:8])
    return out


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model

    mode = os.environ.get("MDE_PROF_MODE", "fwd")
    shapes = {"train": (352, 704), "kitti_test": (352, 1216),
              "nyu": (480, 640)}
    hw = shapes[os.environ.get("MDE_BENCH_SHAPE", "train")]
    batch = int(os.environ.get("MDE_BENCH_BATCH",
                               "4" if mode == "train" else "8"))
    iters = int(os.environ.get("MDE_PROF_ITERS", "6"))
    topn = int(os.environ.get("MDE_PROF_TOPN", "25"))

    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": "base",
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
        "loss": {"alpha": 10.0, "beta": 0.15, "per_image": True},
        "optimizer": {"lr": 1e-4, "weight_decay": 0.1},
        "train": {"num_accum": 1, "grad_norm": 0.1},
        "eval": {"min_depth_eval": 0.001, "max_depth_eval": 80.0,
                 "garg_crop": True},
    })
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *hw, 3), jnp.float32)

    if mode == "train":
        from mde_tpu.train.optim import build_optimizer
        from mde_tpu.train.state import TrainState
        from mde_tpu.train.step import make_train_step
        model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                            use_checkpoint=True)
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x[:1]))()
        tx = build_optimizer(opt, total_steps=100)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                               donate=False)
        batch_d = {"image": x,
                   "depth": jnp.asarray(rng.uniform(0.5, 60.0,
                                                    (batch, *hw, 1)),
                                        jnp.float32)}
        key = jax.random.PRNGKey(1)

        def run_once():
            _, logs = step(state, batch_d, key)
            jax.block_until_ready(logs["loss"])
    else:
        model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                            use_checkpoint=False)
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()
        fwd = jax.jit(lambda p, im: model.apply(p, im, train=False)[0])

        def run_once():
            jax.block_until_ready(fwd(variables, x))

    run_once()  # compile + warmup
    run_once()
    d = tempfile.mkdtemp(prefix="mde_prof_")
    with jax.profiler.trace(d):
        for _ in range(iters):
            run_once()

    durs, lines = collect(d)
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    peak = next((v for k, v in sorted(HBM_GBPS.items(),
                                      key=lambda kv: -len(kv[0]))
                 if k in kind), 819e9)

    # fused-computation composition (identifies what each %fusion.N does)
    comp = {}
    try:
        if mode == "fwd":
            hlo = fwd.lower(variables, x).compile().as_text()
        else:
            hlo = step.lower(state, batch_d, key).compile().as_text()
        comp = fusion_compositions(hlo)
    except Exception as e:
        print(f"# (no composition info: {type(e).__name__}: {e})")

    rows = []
    for k, ds in durs.items():
        n_calls = len(ds) / iters          # calls per iteration
        ms = float(np.sum(ds)) / iters / 1e6
        gb = hlo_line_hbm_bytes(lines[k]) * n_calls / 1e9
        gbps = gb / (ms / 1e3) if ms > 0 else 0.0   # GB per second
        rows.append((ms, gb, gbps, n_calls, k, categorize(lines[k])))
    rows.sort(reverse=True)
    total_ms = sum(r[0] for r in rows)
    total_gb = sum(r[1] for r in rows)
    peak_gbs = peak / 1e9

    print(f"# device={dev.device_kind} mode={mode} batch={batch} hw={hw} "
          f"iters={iters} HBM peak={peak_gbs:.0f} GB/s")
    print(f"# total device time {total_ms:.1f} ms/iter, est HBM {total_gb:.1f} "
          f"GB/iter -> {total_gb / total_ms * 1e3:.0f} GB/s avg "
          f"({total_gb / total_ms * 1e3 / peak_gbs * 100:.0f}% of peak)")
    print(f"{'ms/iter':>8} {'calls':>6} {'GB':>7} {'GB/s':>6} {'%peak':>6} "
          f"{'cum%t':>6}  {'category':<18} op | composition")
    cum = 0.0
    for ms, gb, gbps, n_calls, k, cat in rows[:topn]:
        cum += ms
        print(f"{ms:8.2f} {n_calls:6.0f} {gb:7.2f} {gbps:6.0f} "
              f"{gbps / peak_gbs * 100:6.1f} {cum / total_ms * 100:6.1f}  "
              f"{cat:<18} {k[:28]} | {comp.get(k, '')[:70]}")

    dump = os.environ.get("MDE_PROF_DUMP", "")
    if dump:
        with open(dump, "w") as f:
            f.write("ms\tcalls\tgb\tgbps\tcategory\top\thlo\n")
            for ms, gb, gbps, n_calls, k, cat in rows:
                f.write(f"{ms:.3f}\t{n_calls:.0f}\t{gb:.3f}\t{gbps:.0f}\t"
                        f"{cat}\t{k}\t{lines[k][:400]}\n")
        print(f"# full table -> {dump}")

    print("\n# category rollup")
    agg = defaultdict(lambda: [0.0, 0.0])
    for ms, gb, _, _, _, cat in rows:
        agg[cat][0] += ms
        agg[cat][1] += gb
    for cat, (ms, gb) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms:8.2f} ms  {gb:7.2f} GB  {ms / total_ms * 100:5.1f}%t  "
              f"{(gb / ms * 1e3 / peak_gbs * 100) if ms else 0:5.1f}%bw  "
              f"{cat}")


if __name__ == "__main__":
    main()
