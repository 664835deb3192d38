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


def main():
    import jax

    kind = None
    for i in range(10):
        try:
            got = jax.devices()[0].device_kind
            # HARD TPU check: under JAX_PLATFORMS='' a failed axon
            # registration silently falls back to cpu — never bench that.
            if "TPU" not in got.upper():
                raise RuntimeError(f"non-TPU device {got!r}")
            kind = got
            break
        except RuntimeError as e:
            print(f"# device init failed ({e}); retry {i + 1}/10", flush=True)
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

    t0 = time.time()
    try:
        import bench

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        line = [ln for ln in buf.getvalue().splitlines()
                if ln.startswith("{")][-1]
        with open("/tmp/bench_r3_post.json", "w") as f:
            f.write(line + "\n")
        print(f"# bench done in {time.time() - t0:.0f}s", flush=True)
        print(line, flush=True)
    except Exception:
        print("# bench FAILED:\n" + traceback.format_exc(), flush=True)

    t0 = time.time()
    try:
        import int8_xprof

        int8_xprof.main()
        print(f"# int8 xprof done in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        print("# int8_xprof FAILED:\n" + traceback.format_exc(), flush=True)

    t0 = time.time()
    try:
        import serve_load

        serve_load.main()
        print(f"# serve load done in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        print("# serve_load FAILED:\n" + traceback.format_exc(), flush=True)

    # rel-select A/B at the long lengths the first r3 sweep missed (L=522
    # is beyond the 512 absolute-position cap; T=246/502 -> L=256/512)
    t0 = time.time()
    try:
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
        print(f"# rel-select long A/B done in {time.time() - t0:.0f}s",
              flush=True)
    except Exception:
        print("# rel_select_ab FAILED:\n" + traceback.format_exc(),
              flush=True)

    # train-step xprof: explain the ~25% training MFU with a class breakdown
    t0 = time.time()
    try:
        import train_xprof

        train_xprof.main()
        print(f"# train xprof done in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        print("# train_xprof FAILED:\n" + traceback.format_exc(), flush=True)

    # length-bucket vs longest-pad on the MC shape (VERDICT r2 next #5's
    # on-chip proof): same mixed-length row population both ways
    t0 = time.time()
    try:
        import mc_bucket_ab

        os.environ["FROZENBILM_AB_OUT"] = "/tmp/mc_bucket_ab.json"
        mc_bucket_ab.main()
        print(f"# mc bucket A/B done in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        print("# mc_bucket_ab FAILED:\n" + traceback.format_exc(), flush=True)

    print("# suite complete", flush=True)


if __name__ == "__main__":
    main()
