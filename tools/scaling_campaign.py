#!/usr/bin/env python
"""Scaling campaign runner (round 5; first written round 4).

Waits for the host to exit its memory-ballooning phase (first-touch
page-fault probe, same criterion as ``bench.py --scaling``'s per-leg
gate), then generates the 120M-element corpus if missing and runs the
scaling harness at both CPU pairings (8->32 and 4->16), appending each
JSON result to ``/tmp/scaling_r4/results.jsonl``.

Run detached: ``python tools/scaling_campaign.py &``. Idempotent — a
finished pairing is recorded and skipped on restart.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.environ.get("CAMPAIGN_OUT_DIR", "/tmp/scaling_r5")
RESULTS = os.path.join(OUT_DIR, "results.jsonl")
LOG = os.path.join(OUT_DIR, "campaign.log")
# (cpus, extra-env) pairings; the index-mode leg measures the two-pass
# streaming plan (materialize only the pruned index projection) against
# the same corpus — the round-5 candidate for the memory-bound regime
PAIRINGS = ("8,32", "4,16", "8,32+index")
# overall campaign deadline (seconds) — give up and leave the log
DEADLINE_S = int(os.environ.get("CAMPAIGN_DEADLINE_S", str(5 * 3600)))
PROBE_OK_S = 0.6
# after this long without a clean window, fall back to running at the
# best window seen so far (within DEGRADED_FACTOR of the session-best
# probe) rather than never collecting a measurement; the probe value
# observed at launch is recorded alongside the result so the reader
# can judge the conditions
GRACE_S = int(os.environ.get("CAMPAIGN_GRACE_S", str(45 * 60)))
DEGRADED_FACTOR = float(os.environ.get("CAMPAIGN_DEGRADED_FACTOR", "1.5"))
# last resort: past this point run at the next poll no matter what —
# a measurement with its conditions recorded beats no measurement
FORCE_S = int(os.environ.get("CAMPAIGN_FORCE_S", str(2 * 3600)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def probe() -> float:
    import numpy as np

    t = time.perf_counter()
    a = np.empty(400_000_000, dtype=np.uint8)
    a[::4096] = 1
    del a
    return time.perf_counter() - t


def done_pairings() -> set[str]:
    done = set()
    if os.path.isfile(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add(
                        r.get("pairing")
                        or ",".join(str(c) for c in r["scaling_cpus"])
                    )
                except Exception:
                    pass
    return done


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    start = time.monotonic()
    best_probe = float("inf")
    log(f"campaign start; deadline {DEADLINE_S}s; grace {GRACE_S}s; "
        f"pairings {PAIRINGS}")
    control_done = os.path.isfile(os.path.join(OUT_DIR, "control.done"))
    while time.monotonic() - start < DEADLINE_S:
        remaining = [p for p in PAIRINGS if p not in done_pairings()]
        if not remaining and not control_done:
            # compute-bound MinHash control at 8->32: the same-session
            # engine-vs-box discriminator the flagship result is read
            # against (flagship >= control => engine at the envelope)
            log("pairings done — running MinHash compute control")
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling-control"],
                capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "GRAFT_SCALING_CPUS": "8,32"},
                timeout=2 * 3600,
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode == 0 and lines:
                with open(RESULTS, "a") as f:
                    f.write(lines[-1] + "\n")
                with open(os.path.join(OUT_DIR, "control.done"), "w") as f:
                    f.write("1")
                control_done = True
                log(f"control recorded: {lines[-1][:200]}")
            else:
                log(f"control FAILED rc={proc.returncode}; "
                    f"stderr tail: {proc.stderr[-500:]}")
                time.sleep(300)
            continue
        if not remaining:
            log("all pairings + control recorded — done")
            return 0
        p = probe()
        best_probe = min(best_probe, p)
        elapsed = time.monotonic() - start
        clean = p < PROBE_OK_S
        degraded_ok = (
            elapsed > GRACE_S and p <= max(best_probe * DEGRADED_FACTOR, PROBE_OK_S)
        )
        forced = elapsed > FORCE_S
        log(f"probe {p:.3f}s (clean<{PROBE_OK_S}; best {best_probe:.3f}; "
            f"degraded_ok={degraded_ok}; forced={forced}); remaining {remaining}")
        if not (clean or degraded_ok or forced):
            time.sleep(120)
            continue
        pairing = remaining[0]
        cpus_part, _, variant = pairing.partition("+")
        env = dict(os.environ)
        env["GRAFT_SCALING_CPUS"] = cpus_part
        if variant == "index":
            env["GRAFT_MATERIALIZE_ELEMENTS"] = "index"
        env["GRAFT_SCALING_PROBE_S"] = f"{p:.3f}"
        # per-leg gate inside bench.py still applies (probe can sour
        # mid-campaign); when running degraded, disable its own hard
        # gate (it would spin to its quiet-wait deadline and give up)
        env.setdefault("GRAFT_SCALING_QUIET_WAIT", "1800" if clean else "0")
        log(f"running pairing {pairing} ({'clean' if clean else 'degraded'} "
            f"window, probe {p:.3f}s)")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling",
             "--sf-dir", SF_DIR],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=4 * 3600,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            rec = json.loads(lines[-1])
            rec["pairing"] = pairing
            with open(RESULTS, "a") as f:
                f.write(json.dumps(rec) + "\n")
            log(f"pairing {pairing} recorded: {lines[-1][:200]}")
        else:
            log(f"pairing {pairing} FAILED rc={proc.returncode}; "
                f"stderr tail: {proc.stderr[-1000:]}")
            time.sleep(300)
    log("deadline reached")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
