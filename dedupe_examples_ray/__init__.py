"""Ray-Data-native entity-resolution / record-linkage engine.

A from-scratch re-expression of the capabilities of dedupeio/dedupe-examples
(blocking -> pairwise scoring -> transitive clustering) as idiomatic Ray Data
pipelines over Arrow batches, designed for Common-Crawl-scale Parquet inputs.

Layers
------
- ``extract``      deterministic HTML -> text extraction (byte-identical contract)
- ``synth``        seeded page-corpus generator with planted gold clusters
- ``normalize``    vectorized preProcess normalizers (reference csv_example.py:26-38)
- ``config``       field model + settings artifact (reference csv_example.py:102-110)
- ``distances``    batched string/set/geo/price distance kernels
- ``blocking``     predicate library + fingerprinter stage (reference mysql_example.py:217-226)
- ``pairs``        blocked candidate-pair generation, the wide shuffle (mysql_example.py:240-264)
- ``scoring``      actor-pool pairwise scorer (reference `Dedupe.score`)
- ``cluster``      connected components + confidence + entity map (reference `Dedupe.cluster`)
- ``pipelines``    dedupe / record-link / gazetteer composed flows
- ``ops``          large-scale training-data operators (dedup family, ANN, text stats)
- ``fs_em``        unsupervised Fellegi-Sunter EM match-weight estimation
- ``checkpoint``   per-stage Parquet checkpoints with lineage manifests
- ``evaluate``     pairwise precision/recall/F1 (reference csv_evaluation.py:6-17)

No module calls ``ray.init()``; session ownership belongs to entry points
(bench.py, tests/conftest.py).
"""

__version__ = "0.1.0"
