"""Round-3 on-chip measurement suite, batched in ONE process (a single axon
claim covers everything, per CLAUDE.md):
  1. full bench.py run (post q/kv-fusion + int8_static variants + training,
     decode-roofline, MC, 6B legs)            -> /tmp/bench_r3_post.json
  2. int8 xprof account (bf16/dyn/static)     -> /tmp/int8_xprof_r3.json
  3. serve-under-load (qa bf16+int8 x 3 windows, generate) ->
                                                 /tmp/serve_load_r3.json

Run: nohup bash scripts/tpu_run.sh scripts/tpu_round3_suite.py \
       > /tmp/tpu_suite_r3.log 2>&1 & echo $! > /tmp/tpu_suite.pid
"""

import contextlib
import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def _stage_done(path, tpu_stamp=False):
    """True if a previous attempt already produced this artifact.

    tpu_stamp=True additionally requires a TPU device_kind stamp (or the
    absence of the CPU-smoke 'small' marker) so stale CPU smoke files under
    the same path don't mask the real on-chip run."""
    if not os.path.exists(path):
        return False
    if not tpu_stamp:
        return True
    try:
        with open(path) as f:
            txt = f.read()
        if '"small": true' in txt:
            return False
        if '"device_kind"' in txt:
            # NB round-3 bug: this split ran on txt.upper(), where the
            # lowercase key never matches -> IndexError -> the whole suite
            # crashed at this check on every retry and NO artifact landed
            # (VERDICT r3 weak #2). Split first, then case-fold.
            return "TPU" in txt.split('"device_kind"', 1)[1][:40].upper()
        return False
    except OSError:
        return False


def _devices_with_watchdog(timeout_s=600):
    """jax.devices() in a daemon thread: the axon claim-wait can HANG
    (observed Aug 18: init blocks >10 min instead of erroring). A hung
    init holds jax's backend-init lock, so in-process retry is useless —
    the caller must exit and let scripts/tpu_run.sh start a fresh
    process (fresh claim request)."""
    import threading

    box = {}

    def _t():
        try:
            import jax

            box["kind"] = jax.devices()[0].device_kind
        except Exception as e:  # noqa: BLE001 — report any init failure
            box["err"] = e

    th = threading.Thread(target=_t, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return None, f"device init hung >{timeout_s}s (claim-wait)"
    if "err" in box:
        return None, str(box["err"])
    return box["kind"], None


def main():
    kind = None
    for i in range(10):
        got, err = _devices_with_watchdog()
        if err is None and "TPU" not in got.upper():
            # HARD TPU check: under JAX_PLATFORMS='' a failed axon
            # registration silently falls back to cpu — never bench that.
            err, got = f"non-TPU device {got!r}", None
        if err is None:
            kind = got
            break
        print(f"# device init failed ({err}); retry {i + 1}/10", flush=True)
        if "hung" in err:
            # the hung thread pins the backend-init lock for the life of
            # this process; only a fresh process can retry the claim
            sys.exit(17)
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass
        time.sleep(60)
    if kind is None:
        # non-zero exit -> scripts/tpu_run.sh relaunches after its sleep
        sys.exit(17)
    print(f"# device: {kind}", flush=True)

    # Each stage: skip if a previous attempt's artifact exists (tpu_run.sh
    # relaunches this script from scratch on non-zero exit, so completed
    # stages must be idempotent), record failures, and exit non-zero if any
    # stage is still missing — a mid-run chip drop then retries instead of
    # silently "completing" without the artifact.
    failed = []

    def stage(name, fn, out_path, tpu_stamp=False):
        if _stage_done(out_path, tpu_stamp=tpu_stamp):
            print(f"# {name}: artifact exists, skipping", flush=True)
            return
        t0 = time.time()
        try:
            fn()
            print(f"# {name} done in {time.time() - t0:.0f}s", flush=True)
        except Exception:
            failed.append(name)
            print(f"# {name} FAILED:\n" + traceback.format_exc(), flush=True)

    def run_bench():
        import bench

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        line = [ln for ln in buf.getvalue().splitlines()
                if ln.startswith("{")][-1]
        with open("/tmp/bench_r3_post.json", "w") as f:
            f.write(line + "\n")
        print(line, flush=True)

    def run_int8_xprof():
        import int8_xprof

        int8_xprof.main()

    def run_serve_load():
        import serve_load

        serve_load.main()

    def run_rel_ab_long():
        # rel-select A/B at the long lengths the first r3 sweep missed
        # (L=522 is beyond the 512 absolute-position cap; T=246/502 ->
        # L=256/512)
        import rel_select_ab

        rows = []
        for T, B in ((246, 32), (502, 16)):
            for mode in ("onehot", "skew", "skewc", "gather"):
                try:
                    rows.append(rel_select_ab.run(mode, T=T, B=B))
                except Exception as e:
                    rows.append({"mode": mode, "L": T + 10,
                                 "error": repr(e)[:200]})
        with open("/tmp/rel_ab_long_r3.json", "w") as f:
            json.dump(rows, f, indent=1)

    def run_train_xprof():
        # explain the ~25% training MFU with a class breakdown
        import train_xprof

        train_xprof.main()

    def run_mc_bucket_ab():
        # length-bucket vs longest-pad on the MC shape (VERDICT r2 next
        # #5's on-chip proof): same mixed-length row population both ways
        import mc_bucket_ab

        os.environ["FROZENBILM_AB_OUT"] = "/tmp/mc_bucket_ab.json"
        mc_bucket_ab.main()

    stage("bench", run_bench, "/tmp/bench_r3_post.json")
    stage("int8_xprof", run_int8_xprof, "/tmp/int8_xprof_r3.json",
          tpu_stamp=True)
    stage("serve_load", run_serve_load, "/tmp/serve_load_r3.json",
          tpu_stamp=True)
    stage("rel_ab_long", run_rel_ab_long, "/tmp/rel_ab_long_r3.json")
    stage("train_xprof", run_train_xprof, "/tmp/train_xprof_r3.json",
          tpu_stamp=True)
    stage("mc_bucket_ab", run_mc_bucket_ab, "/tmp/mc_bucket_ab.json")

    if failed:
        print(f"# suite INCOMPLETE, failed stages: {failed}", flush=True)
        sys.exit(18)
    print("# suite complete", flush=True)


if __name__ == "__main__":
    main()
