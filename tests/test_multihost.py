"""Multi-host glue on the virtual 8-device CPU mesh (single process —
jax.distributed untouched; the sharded kernels and the
make_array_from_process_local_data assembly path are exercised)."""

import numpy as np


class TestMultihost:
    def test_initialize_single_process(self):
        from cartographer_tpu.parallel import multihost

        ctx = multihost.initialize()
        assert ctx.num_processes == 1
        assert ctx.is_coordinator
        assert len(ctx.mesh.devices.reshape(-1)) == 8

    def test_global_batch_assembly(self):
        import jax

        from cartographer_tpu.parallel import multihost

        ctx = multihost.initialize()
        rows = np.arange(64, dtype=np.float32).reshape(16, 4)
        arr = multihost.make_global_batch(ctx, rows)
        assert arr.shape == (16, 4)
        np.testing.assert_array_equal(np.asarray(arr), rows)
        # Sharded over the worker axis.
        assert len(arr.sharding.device_set) == 8

    def test_worker_main_runs(self):
        from cartographer_tpu.tools import multihost_worker

        assert (
            multihost_worker.main(
                ["--candidates_per_device", "64", "--spa_nodes", "128"]
            )
            == 0
        )
