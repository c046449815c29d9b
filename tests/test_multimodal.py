from rnadam_spark.operators import multimodal as mm


def _assets(spark):
    rows = [
        (1, "image", bytearray(b"abcdef" * 10), {"source": "s"}),
        (2, "video", bytearray(b"\x00\x01\x02\x03" * 25), {}),
        (3, "audio", bytearray(b""), {}),
    ]
    return spark.createDataFrame(rows, mm.ASSETS)


def test_decode_assets_stub(spark):
    got = {r.asset_id: r for r in mm.decode_assets(_assets(spark)).collect()}
    assert got[1].n_bytes == 60 and got[2].n_bytes == 100 and got[3].n_bytes == 0
    # deterministic fake dims: stable across runs/partitionings
    again = {r.asset_id: r for r in mm.decode_assets(_assets(spark).repartition(3)).collect()}
    for k in got:
        assert (got[k].width, got[k].height) == (again[k].width, again[k].height)
        assert 16 <= got[k].width < 80


def test_byte_histogram_features(spark):
    feats = {r.asset_id: r.features for r in mm.byte_histogram_features(_assets(spark)).collect()}
    assert len(feats[1]) == 16
    assert abs(sum(feats[1]) - 1.0) < 1e-9
    assert sum(feats[3]) == 0.0  # empty payload → zero vector, no NaN


def test_sample_frames_video_only(spark):
    rows = mm.sample_frames(_assets(spark), n_frames=4).collect()
    assert {r.asset_id for r in rows} == {2}
    assert [r.frame_offset for r in rows] == [0, 25, 50, 75]


def test_assets_from_documents_schema(spark):
    docs = spark.createDataFrame(
        [(7, "hello world", "en", "src0", 11)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    a = mm.assets_from_documents(docs).collect()[0]
    assert a.asset_id == 7 and bytes(a.data) == b"hello world"
    assert a.meta["lang"] == "en"
