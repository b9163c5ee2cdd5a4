"""Worker for the 2-process eval.py test (launched by
tests/test_eval_multihost.py): initializes jax.distributed on CPU with
8//nproc local devices, then runs eval.py's main() with the given CLI args —
the SPMD analog of the reference's `torch.distributed.launch --nproc-per-node
eval.py` entry (`/root/reference/eval.py:83-107`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    eval_args = sys.argv[4:]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    # amortize the InceptionV3/engine CPU compiles across the test's three
    # worker processes (and reruns) — the dominant cost at tiny shapes
    cache = os.environ.get("GVQ_TEST_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                                   process_id=pid)

    import eval as eval_cli

    sys.argv = ["eval.py"] + eval_args
    eval_cli.main()
    print(f"eval worker {pid} done", flush=True)


if __name__ == "__main__":
    _main()
