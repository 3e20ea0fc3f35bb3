"""parquet2_ray — a Ray-Data-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of jorgecarleitao/parquet2
(reference at /root/reference, cited by file:line throughout) on top of
ray.data.Dataset pipelines:

- ``codecs``     pure NumPy encode/decode kernels (bitpack, hybrid RLE,
                 delta-binary-packed, delta byte-array family, dictionary,
                 FSST, frame-of-reference) — the analog of the reference's
                 ``src/encoding/`` tree.
- ``functions``  column statistics, codec auto-selection, text analysis,
                 hashing/fingerprints, minhash/simhash sketches.
- ``sources``    deterministic synthetic token-table generation + readers.
- ``stages``     Ray Data map_batches / map_groups stage callables.
- ``pipelines``  end-to-end encode → shuffle → write → manifest and
                 decode/verify pipelines.
- ``state``      per-partition lineage ledger + resumable manifest.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (bench.py, tests/conftest.py, or the evaluation driver).
"""

__version__ = "0.1.0"
