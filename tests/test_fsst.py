

def test_tokenize_strategies_bit_identical():
    """The size-dispatched strategies (pointer-doubling vs frontier
    walk) must emit the SAME token stream — ratio and committed bytes
    cannot depend on which side of _DOUBLING_MAX a buffer lands."""
    import numpy as np

    from parquet2_ray.codecs import fsst

    rng = np.random.default_rng(7)
    base = b"".join(b"doc-%05d/shard/%03d " % (i, i % 7) for i in range(40))
    raw = base + rng.integers(32, 127, 30_000, dtype=np.uint8).tobytes()
    raw = raw * 3
    table = fsst.train(raw[: 1 << 14])
    d = np.frombuffer(raw, dtype=np.uint8)
    for chunk in (512, 64, 33):
        a = fsst._tokenize_walk(table, d, chunk)
        b = fsst._tokenize_doubling(table, d, chunk)
        for x, y in zip(a, b):
            assert x.shape == y.shape and (x == y).all()
