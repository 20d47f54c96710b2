"""Worker for the 2-process jax.distributed CPU test.

Run as: python tests/mp_worker.py PROCESS_ID NUM_PROCESSES PORT
Each process contributes its one CPU device to a global mesh, runs the
fully-distributed build + sharded queries, and process 0 prints a
machine-checkable result line.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from femto_tpu.parallel import distributed as ftd

    ftd.initialize(coordinator_address=f"localhost:{port}",
                   num_processes=nproc, process_id=pid,
                   cpu_collectives="gloo")
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc  # one CPU device per process

    import numpy as np

    import femto_tpu as ft
    from femto_tpu.alphabet import pattern_to_alpha
    from femto_tpu.parallel.dist_build import build_index_sharded
    from femto_tpu.parallel.dist_query import sharded_backward_search
    from femto_tpu.search import pack_patterns

    mesh = ftd.global_mesh()
    docs = [
        b"the quick brown fox jumps over the lazy dog",
        b"banana banana banana",
        b"abracadabra" * 5,
    ]
    prepared = ft.prepare_documents(docs)
    index = build_index_sharded(prepared, mesh, seg=32, mark_period=8)

    pats = [b"banana", b"abra", b"the", b"zz"]
    packed, B = pack_patterns([pattern_to_alpha(p) for p in pats])
    first, last = sharded_backward_search(index, mesh, packed, routed=False)
    counts = (np.asarray(jax.device_get(last))
              - np.asarray(jax.device_get(first)))[:B]
    if pid == 0:
        print("MP_COUNTS:" + ",".join(str(int(c)) for c in counts), flush=True)


if __name__ == "__main__":
    main()
