#!/usr/bin/env python
"""Host-side data-pipeline decode throughput (PARITY.md evidence).

SURVEY.md §3.5 hazard 4: single-threaded Python JPEG decode can starve
the chip.  This measures the full streaming path the GQN loader uses in
training — TFRecord framing walk -> record shuffle/interleave -> JPEG
decode worker pool -> film-strip transform — on a synthetic mazes-like
fixture (84x84 RGB JPEGs), and reports videos/sec + frames/sec for
worker counts 1 and 4, next to the chip's measured consumption rate.

Runs on the host CPU only (no jax).  Emits one JSON line.
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fake_jpeg(rng, h, w):
    from PIL import Image

    buf = io.BytesIO()
    arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--time-steps", type=int, default=15)
    p.add_argument("--frame-size", type=int, default=84)
    p.add_argument("--videos", type=int, default=300,
                   help="videos to pull through the pipeline per timing")
    p.add_argument("--files", type=int, default=4)
    p.add_argument("--records-per-file", type=int, default=32)
    args = p.parse_args()

    from kccotgan_tpu.data.gqn import GQN_DATASETS, GqnReader, gqn_record_files
    from kccotgan_tpu.data.tfrecord import encode_example, write_tfrecord

    info = GQN_DATASETS["mazes"]
    rng = np.random.default_rng(0)
    out = {
        "fixture": f"{args.frame_size}x{args.frame_size} RGB JPEG, "
        f"T={args.time_steps}, {args.files} files x {args.records_per_file} records",
        "videos_timed": args.videos,
    }
    with tempfile.TemporaryDirectory() as root:
        files = gqn_record_files(info, "train", root)[: args.files]
        # distinct JPEGs per record so decode isn't cache-warm identical
        for f in files:
            recs = []
            for _ in range(args.records_per_file):
                jpegs = [
                    _fake_jpeg(rng, args.frame_size, args.frame_size)
                    for _ in range(args.time_steps)
                ]
                recs.append(encode_example({"frames": jpegs}))
            write_tfrecord(f, recs)

        for workers in (1, 4):
            reader = GqnReader(
                "mazes", time_steps=args.time_steps, root=root,
                decode_workers=workers,
            )
            it = reader.samples()
            next(it)  # prime (spins up pool, opens files)
            t0 = time.perf_counter()
            for _ in range(args.videos):
                next(it)
            dt = time.perf_counter() - t0
            vps = args.videos / dt
            out[f"workers_{workers}"] = {
                "videos_per_sec": round(vps, 1),
                "frames_per_sec": round(vps * args.time_steps, 1),
            }
            print(
                f"# workers={workers}: {vps:.1f} videos/s "
                f"({vps * args.time_steps:.0f} frames/s)",
                file=sys.stderr,
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
