"""autoner_ray — Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference
(shangjingbo1226/AutoNER, read-only at /root/reference) as idiomatic
Ray Data pipelines: streaming ``ray.data.Dataset`` over Parquet pages,
zero-copy Arrow ``map_batches`` stages, actor pools for stateful stages
(trie dictionary matcher, tagger scorer), and explicit groupby shuffles
for canonicalization / edge aggregation.

Layout
------
- ``functions/`` pure scalar/vector helpers (tokenizer, ck serializer, hashes)
- ``state/``     broadcastable state built once per actor (trie, dictionaries)
- ``stages/``    map_batches stage callables (stateless fns + actor classes)
- ``sources/``   readers / synthetic page derivation
- ``pipelines/`` end-to-end dataset pipelines (flagship KG construction)
- ``oracle/``    single-process pure-python oracle used by tests

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"
