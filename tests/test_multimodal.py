import zlib

import numpy as np
import pytest

from ffcl_spark.datagen import docs_from_points
from ffcl_spark.operators import multimodal as MM


def test_feature_extraction_matches_local(spark):
    docs = docs_from_points(spark, "blobs", 100)
    media = MM.media_binary(docs)
    got = MM.extract_features(media).toPandas().set_index(["doc_id", "offset"])
    local = media.toPandas()
    for r in local.itertuples():
        b = bytes(r.media_bytes)
        row = got.loc[(r.doc_id, r.offset)]
        assert row.n_bytes == len(b)
        assert row.byte_crc == zlib.crc32(b)
        assert abs(row.byte_mean - np.frombuffer(b, dtype=np.uint8).mean()) < 1e-9


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_real("image/png")


def test_media_binary_schema(spark):
    docs = docs_from_points(spark, "blobs", 50)
    media = MM.media_binary(docs)
    kinds = dict(media.dtypes)
    assert kinds["media_bytes"] == "binary"
    assert media.count() == 50  # one media span per… two per doc of 25 docs
