"""Device ring buffer / double-buffered streaming (SURVEY §7 step 7)."""

import numpy as np

from uvol_tpu.runtime.device_stream import DeviceRingBuffer, stream_frames


def test_ring_buffer_eviction():
    ring = DeviceRingBuffer(num_slots=2)
    for i in range(5):
        ring.put(i, np.full((4,), i, np.float32))
    assert len(ring) == 2
    assert ring.get(2) is None  # evicted
    assert ring.get(3) is not None and ring.get(4) is not None
    np.testing.assert_array_equal(np.asarray(ring.get(4)), np.full(4, 4.0))


def test_stream_frames_matches_sequential():
    import jax
    import jax.numpy as jnp

    frames = [np.full((8, 8), i, np.float32) for i in range(7)]

    @jax.jit
    def step(x):
        return jnp.sum(x * 2.0)

    out = list(stream_frames(frames, step, num_slots=2))
    assert [i for i, _ in out] == list(range(7))
    for i, r in out:
        assert float(r) == float(np.sum(frames[i] * 2.0))


def test_stream_frames_stays_one_window_ahead():
    uploads = []
    computed = []

    class FakeDev:
        pass

    import uvol_tpu.runtime.device_stream as ds

    class Ring(ds.DeviceRingBuffer):
        def __init__(self, **kw):
            self.num_slots = kw.get("num_slots", 2)
            self._slots = {}

        def put(self, index, host):
            uploads.append(index)
            self._slots[index] = host
            for k in sorted(self._slots):
                if k <= index - self.num_slots:
                    del self._slots[k]
            return host

    orig = ds.DeviceRingBuffer
    ds.DeviceRingBuffer = Ring
    try:
        def step(x):
            computed.append(int(x[0]))
            # the NEXT window's upload must already have been issued
            assert len(uploads) >= min(len(computed) + 1, 5)
            return x

        frames = [np.full(2, i) for i in range(5)]
        list(ds.stream_frames(frames, step))
    finally:
        ds.DeviceRingBuffer = orig
    assert computed == list(range(5))
