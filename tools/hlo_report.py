#!/usr/bin/env python
"""Compiled-HLO report for the full training step (layout forensics).

Lowers + compiles the flagship train step for the current backend and
greps the optimized HLO for materialized data-movement ops (transpose /
copy / bitcast-convert fusions), reporting the largest by byte count.
Used to decide whether time-major scan layout plumbing is worth it
(PARITY.md phase-breakdown follow-up).

Emits a JSON line with the top offenders.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "u8": 1, "s8": 1}


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--context", type=int, default=10)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--time-major", action="store_true",
                   help="report the time-major generator layout program")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp

    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.train import GanModules, build_train_step, create_train_state

    cfg = TrainConfig(
        dname="mmnist",
        batch_size=args.batch,
        total_time_steps=args.time_steps,
        int_time_steps=args.context,
        sinkhorn_l=100,
        donate_buffers=False,
        time_major=args.time_major,
        model=ModelConfig(x_height=64, x_width=64, n_channels=1),
    )
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = build_train_step(cfg, mods)
    batch = jnp.array(bouncing_blobs(args.batch, args.time_steps, 64, 64, seed=0))

    compiled = jax.jit(step_fn).lower(state, batch).compile()
    texts = compiled.as_text()
    if not isinstance(texts, str):
        texts = "\n".join(texts)

    ops = []  # (bytes, kind, line)
    for line in texts.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+) (transpose|copy)\(", ls)
        if m:
            ops.append((shape_bytes(m.group(1)), m.group(2), ls[:140]))
            continue
        # fusions whose root is a transpose/copy show up as kind=kLoop
        # fusions; approximate by fusions literally named *transpose*
        m = re.match(r"%?[\w.\-]*transpose[\w.\-]* = (\S+) fusion\(", ls)
        if m:
            ops.append((shape_bytes(m.group(1)), "transpose-fusion", ls[:140]))

    ops.sort(reverse=True)
    total = sum(b for b, _, _ in ops)
    print(f"# {len(ops)} materialized transpose/copy ops, {total/1e6:.1f} MB total output", file=sys.stderr)
    for b, kind, ls in ops[: args.top]:
        print(f"# {b/1e6:9.2f} MB {kind:18s} {ls}", file=sys.stderr)
    print(
        json.dumps(
            {
                "n_transpose_copy_ops": len(ops),
                "total_mb": round(total / 1e6, 1),
                "top": [
                    {"mb": round(b / 1e6, 2), "kind": kind} for b, kind, ls in ops[: args.top]
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
