"""Round-4 on-chip measurement suite. Unlike round 3's single-process suite
(whose shared HBM state OOM'd the rel-select stage and whose _stage_done
bug crashed the rest — see tpu_round3_suite.py), every stage here runs in
its OWN subprocess: fresh HBM, fresh claim, one stage's crash cannot take
down the others. Stages are idempotent (skipped when their artifact already
exists with a TPU stamp where applicable).

Stages -> artifacts (then `bash scripts/harvest_r4.sh` commits them):
  train_xprof   /tmp/train_xprof_r3.json     (class breakdown of train step)
  mc_bucket_ab  /tmp/mc_bucket_ab.json       (VERDICT r2 #5 proof)
  mc_profile    /tmp/mc_profile.json         (models/deberta.py:282 citation)
  rel_ab_long   /tmp/rel_ab_long_r3.json     (L in {256,512} selection A/B)
  serve_load    /tmp/serve_load_r3.json      (VERDICT r2 #7 proof)
  train_knee    /tmp/train_knee_r4.json      (B sweep, VERDICT r3 #6)

Run: nohup python scripts/tpu_round4_suite.py > /tmp/tpu_suite_r4.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tpu_stamped(path):
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            txt = f.read()
        if '"small": true' in txt:
            return False
        if '"device_kind"' in txt:
            return "TPU" in txt.split('"device_kind"', 1)[1][:40].upper()
        return True  # artifact formats without a stamp: existence is enough
    except OSError:
        return False


STAGES = (
    # (name, argv (run from REPO), artifact, timeout_s, extra_env)
    ("train_xprof", ["scripts/train_xprof.py"], "/tmp/train_xprof_r3.json",
     2400, {}),
    ("mc_bucket_ab", ["scripts/mc_bucket_ab.py"], "/tmp/mc_bucket_ab.json",
     3600, {"FROZENBILM_AB_OUT": "/tmp/mc_bucket_ab.json"}),
    ("mc_profile", ["scripts/mc_profile.py"], "/tmp/mc_profile.json", 3600,
     {}),
    ("rel_ab_long",
     ["scripts/rel_select_ab.py", "onehot", "skew", "skewc", "gather"],
     "/tmp/rel_ab_long_r3.json", 3600,
     {"FROZENBILM_AB_LENGTHS": "246,502",
      "FROZENBILM_AB_OUT": "/tmp/rel_ab_long_r3.json"}),
    ("serve_load", ["scripts/serve_load.py"], "/tmp/serve_load_r3.json",
     3600, {}),
    ("train_knee", ["scripts/train_knee.py"], "/tmp/train_knee_r4.json",
     3600, {}),
)


def main():
    only = set(sys.argv[1:])
    failed = []
    for name, argv, artifact, timeout_s, extra_env in STAGES:
        if only and name not in only:
            continue
        if _tpu_stamped(artifact):
            print(f"# {name}: artifact exists, skipping", flush=True)
            continue
        print(f"### stage {name}", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable] + argv, cwd=REPO,
                               timeout=timeout_s,
                               env={**os.environ, **extra_env})
            ok = p.returncode == 0 and os.path.exists(artifact)
        except subprocess.TimeoutExpired:
            ok = False
            print(f"# {name}: TIMEOUT after {timeout_s}s", flush=True)
        print(f"# {name}: {'done' if ok else 'FAILED'} "
              f"in {time.time() - t0:.0f}s", flush=True)
        if not ok:
            failed.append(name)
        time.sleep(60)  # claim release lag between chip processes
    if failed:
        print(f"# suite INCOMPLETE, failed: {failed}", flush=True)
        sys.exit(18)
    print("# suite complete", flush=True)


if __name__ == "__main__":
    main()
