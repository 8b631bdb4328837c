"""ONE parametrized lifecycle suite over EVERY StoredArtifact subclass
(`functions/stored_artifact.py`): CorpusIndex, ClusterIndex, AnnIndex,
UnigramTokenizer, BloomGate, CmsSketch, HllSketch.

Each subclass's behavior-specific coverage stays in its own test file;
this matrix pins the SHARED contract the base class declares — so the
next artifact (or a refactor of the base) can't regress it silently
for one member while the others' bespoke tests still pass:

1. attach() on a missing table raises, naming the artifact kind;
2. the hyper-parameter family round-trips through TBLPROPERTIES and a
   bare attach() ADOPTS the stored values;
3. attach() with a mismatched family kwarg hard-fails, naming the
   offending property and the class's consequence hint — serving
   state derived under a different family is silent garbage, which is
   the whole reason the base validates;
4. last_batch_id() is -1 on a fresh build (no maintainer has run);
5. drop() removes the table and a re-attach raises again.
"""

from __future__ import annotations

import uuid

import pytest

from kpipe_spark.functions.ann_index import AnnIndex
from kpipe_spark.functions.cluster_index import ClusterIndex
from kpipe_spark.functions.corpus_index import CorpusIndex
from kpipe_spark.functions.sketches import BloomGate, CmsSketch, HllSketch
from kpipe_spark.functions.unigram import UnigramTokenizer

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark):
    # i % 5 repeats the text -> real near-dup pairs for ClusterIndex;
    # plenty of words for the tokenizer/shingle builders
    rows = [
        (i, "alpha beta gamma delta epsilon zeta %d" % (i % 5), "web", 40)
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


# name -> (class, build(spark, table) -> artifact, mismatched-family kwargs)
CASES = {
    "corpus_index": (
        CorpusIndex,
        lambda s, t: CorpusIndex.build(s, _docs(s), t, num_buckets=2),
        {"num_hashes": 7},
    ),
    "cluster_index": (
        ClusterIndex,
        lambda s, t: ClusterIndex.build(s, _docs(s), t),
        {"shingle_k": 9},
    ),
    "ann_index": (
        AnnIndex,
        lambda s, t: AnnIndex.build(
            s, s.read.parquet(f"{SF_SMALL}/embeddings.parquet"), t
        ),
        {"n_cells": 3},
    ),
    "unigram_tokenizer": (
        UnigramTokenizer,
        lambda s, t: UnigramTokenizer.build(s, _docs(s), t),
        {"max_piece_len": 2},
    ),
    "bloom_gate": (
        BloomGate,
        lambda s, t: BloomGate.build(s, _docs(s), t),
        {"m": 17},
    ),
    "cms_sketch": (
        CmsSketch,
        lambda s, t: CmsSketch.build(s, _docs(s), t),
        {"width": 17},
    ),
    "hll_sketch": (
        HllSketch,
        lambda s, t: HllSketch.build(s, _docs(s), t),
        {"m": 17},
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_stored_artifact_contract(spark, name):
    cls, build, mismatch = CASES[name]
    table = f"contract_{name}_{uuid.uuid4().hex[:8]}"

    # 1. attaching before any build names the kind in the error
    with pytest.raises(ValueError, match="no such"):
        cls.attach(spark, table)

    art = build(spark, table)
    try:
        # 2. family round-trips through TBLPROPERTIES...
        stored = art._read_props()
        for prop in cls._FAMILY_PROPS:
            assert stored[prop] == getattr(art, prop), (name, prop)
        # ...and a bare attach ADOPTS the stored values
        again = cls.attach(spark, art.table)
        for prop in cls._FAMILY_PROPS:
            assert getattr(again, prop) == getattr(art, prop), (name, prop)

        # 3. a mismatched family kwarg is refused, naming the property
        (bad_prop,) = mismatch
        assert mismatch[bad_prop] != getattr(art, bad_prop), (
            "test bug: mismatch value collides with the built family"
        )
        with pytest.raises(ValueError, match=bad_prop):
            cls.attach(spark, art.table, **mismatch)

        # 4. no maintainer has run on a fresh build
        assert art.last_batch_id() == -1, name
    finally:
        # 5. drop removes the table; re-attach raises again
        art.drop()
    assert not spark.catalog.tableExists(table), name
    with pytest.raises(ValueError, match="no such"):
        cls.attach(spark, table)
