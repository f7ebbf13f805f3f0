"""Experiment launcher.

Parity: reference ``launch.py:27-93`` — picks the task's train script, tees
stdout to ``./output/<exp>_log.txt``. The reference fans out N GPU processes
via torch.distributed.launch; on TPU one process drives all local chips
through the mesh, and multi-host pods launch one process per host with
``jax.distributed`` picking up the pod runtime — so the launcher is a thin
exec + log-tee.

Usage:
    python launch.py --task clip --cfg configs/clip/simseg.vit-b.yaml [k=v ...]
"""

import argparse
import os
import signal
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
TASKS = {
    "clip": os.path.join(_HERE, "simseg_tpu", "tasks", "clip", "train.py"),
    "linear_prob": os.path.join(_HERE, "simseg_tpu", "tasks", "linear_prob",
                                "train.py"),
}


def main():
    parser = argparse.ArgumentParser(description="SimSeg-TPU launcher")
    parser.add_argument("--task", type=str, default="clip", choices=sorted(TASKS))
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--exp_name", type=str, default="")
    args, passthrough = parser.parse_known_args()

    exp = args.exp_name
    if not exp:
        exp = os.path.splitext(os.path.basename(args.cfg))[0]

    os.makedirs("./output", exist_ok=True)
    log_path = f"./output/{exp}_log.txt"

    cmd = [sys.executable, TASKS[args.task], "--cfg", args.cfg] + passthrough
    print(f"[launch] {' '.join(cmd)}")
    print(f"[launch] teeing output to {log_path}")

    with open(log_path, "a") as log:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
        )

        # forward preemption (SIGTERM, sent to the launcher pid) to the
        # trainer so its PreemptionHook can checkpoint and exit cleanly.
        # SIGINT is NOT forwarded: a terminal Ctrl+C already reaches the
        # whole foreground process group (launcher AND trainer) — sending
        # a second SIGINT would interrupt the trainer's in-progress
        # checkpoint save. The launcher keeps teeing until the child
        # finishes.
        def _forward(signum, frame):
            try:
                proc.send_signal(signum)
            except ProcessLookupError:
                pass

        signal.signal(signal.SIGTERM, _forward)
        signal.signal(signal.SIGINT, signal.SIG_IGN)

        for line in proc.stdout:
            sys.stdout.write(line)
            log.write(line)
        proc.wait()
    rc = proc.returncode
    # a signal-killed child has rc = -sig; report the conventional 128+sig
    # (raw negative ints get truncated to a misleading byte by C exit())
    sys.exit(128 - rc if rc < 0 else rc)


if __name__ == "__main__":
    main()
