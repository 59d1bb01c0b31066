"""Multi-host input feeding (single-process degenerate case + slice math).

``care_tpu/parallel/input.py`` assembles per-process numpy batches into
global data-sharded ``jax.Array``s via
``jax.make_array_from_process_local_data`` (SURVEY §7.9 pod-input recipe).
With one process the result must equal ``shard_batch``; the per-process
slice arithmetic is checked for simulated multi-process layouts.
"""

import numpy as np
import pytest

import jax

from care_tpu.parallel import make_mesh, shard_batch, DATA_AXIS
from care_tpu.parallel.input import (process_slice, global_batch_from_local,
                                     HostShardedBatches)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 CPU devices")
    return make_mesh({DATA_AXIS: 4}, devices=devs[:4])


def test_process_slice_partitions_batch():
    slices = [process_slice(64, process_index=i, process_count=4)
              for i in range(4)]
    rows = np.concatenate([np.arange(64)[s] for s in slices])
    np.testing.assert_array_equal(rows, np.arange(64))
    assert all(s.stop - s.start == 16 for s in slices)
    with pytest.raises(AssertionError):
        process_slice(10, process_index=0, process_count=4)


def test_global_batch_single_process_equals_shard_batch(mesh):
    rs = np.random.RandomState(0)
    batch = {"feats": [rs.randn(8, 6, 4).astype(np.float32)],
             "input_ids": rs.randint(0, 50, (8, 9)),
             "batch_mask": np.ones((8,), np.float32)}
    ours = global_batch_from_local(batch, mesh)
    ref = shard_batch(batch, mesh)

    for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding, (a.sharding, b.sharding)


@pytest.mark.parametrize("pc", [2, 4])
def test_simulated_processes_assemble_global_batch(mesh, monkeypatch, pc):
    """Monkeypatched ``jax.process_index/process_count`` drive
    ``HostShardedBatches`` once per simulated process; the captured
    per-process local batches must reassemble the EXACT global batch
    (row-for-row, catching any off-by-one in ``process_slice``), and their
    row blocks must line up with the addressable-shard layout that
    single-process assembly places on the mesh's device order — the
    contract ``make_array_from_process_local_data`` relies on when each
    process really owns only its devices."""
    import care_tpu.parallel.input as inp

    rs = np.random.RandomState(7)
    B = 8
    batch = {"feats": [rs.randn(B, 3, 4).astype(np.float32)],
             "input_ids": rs.randint(0, 50, (B, 5)),
             "scalar": np.float32(3.5)}

    class OneBatchLoader:
        def __len__(self):
            return 1

        def __iter__(self):
            return iter([batch])

    captured = {}

    def fake_assemble(local, mesh_, global_batch_size=None):
        captured["local"] = local
        captured["gbs"] = global_batch_size
        return local

    monkeypatch.setattr(inp, "global_batch_from_local", fake_assemble)

    locals_per_process = []
    for pi in range(pc):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        list(inp.HostShardedBatches(OneBatchLoader(), mesh))
        assert captured["gbs"] == B
        local = captured["local"]
        assert local["feats"][0].shape[0] == B // pc
        assert local["input_ids"].shape[0] == B // pc
        # non-batch leaves pass through unsliced
        assert local["scalar"] == np.float32(3.5)
        locals_per_process.append(local)
    monkeypatch.undo()

    # disjoint cover: concatenating per-process slices in process order
    # reproduces the global batch exactly
    np.testing.assert_array_equal(
        np.concatenate([l["feats"][0] for l in locals_per_process]),
        batch["feats"][0])
    np.testing.assert_array_equal(
        np.concatenate([l["input_ids"] for l in locals_per_process]),
        batch["input_ids"])

    # device-order contract: the single-process assembly puts row block
    # d*B/D..(d+1)*B/D on mesh device d; process p owns the contiguous
    # device block [p*D/pc, (p+1)*D/pc), so its rows must equal the data
    # those devices hold
    garr = global_batch_from_local(batch, mesh)["feats"][0]
    D = len(mesh.devices.ravel())
    shard_by_device = {s.device: np.asarray(s.data)
                       for s in garr.addressable_shards}
    dev_order = list(mesh.devices.ravel())
    for pi, local in enumerate(locals_per_process):
        owned = dev_order[pi * (D // pc):(pi + 1) * (D // pc)]
        from_devices = np.concatenate([shard_by_device[d] for d in owned])
        np.testing.assert_array_equal(local["feats"][0], from_devices)


def test_host_sharded_batches_wraps_loader(mesh):
    rs = np.random.RandomState(1)
    batches = [{"feats": [rs.randn(8, 4).astype(np.float32)],
                "input_ids": rs.randint(0, 50, (8, 5))}
               for _ in range(3)]

    class FakeLoader:
        epoch = None

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    wrapped = HostShardedBatches(FakeLoader(), mesh)
    wrapped.set_epoch(2)
    assert wrapped.loader.epoch == 2
    assert len(wrapped) == 3
    out = list(wrapped)
    assert len(out) == 3
    for got, src in zip(out, batches):
        arr = got["feats"][0]
        assert arr.shape == (8, 4)  # single process: local IS global
        assert getattr(arr.sharding, "mesh", None) is not None
        np.testing.assert_array_equal(np.asarray(arr), src["feats"][0])

    # the global batch feeds a jitted mean like any sharded array
    total = jax.jit(lambda x: x.sum())(out[0]["feats"][0])
    np.testing.assert_allclose(float(total), batches[0]["feats"][0].sum(),
                               rtol=1e-6)
