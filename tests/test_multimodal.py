"""Multimodal plumbing: schemas, mapInPandas stages, vector hand-off."""

import numpy as np
import pytest

from hybrid_vector_search_spark.operators import multimodal as MM
from hybrid_vector_search_spark.operators.topk import topk


@pytest.fixture(scope="module")
def media(spark):
    imgs = MM.synth_media_table(spark, n=8, kind="image")
    vids = MM.synth_media_table(spark, n=4, kind="video", seed=9)
    # shift video ids past the image ids
    vids = vids.withColumn("media_id", vids.media_id + 100)
    return imgs.unionByName(vids)


def test_decode_images_only_images_cross_arrow(media):
    out = MM.decode_images(media).collect()
    assert len(out) == 8
    r = {x.media_id: x for x in out}[0]
    assert r.channels == 3 and len(r.checksum) == 32  # full md5 hex
    assert 0.0 <= r.mean_pixel <= 255.0
    assert r.n_bytes == 256


def test_media_from_documents_decode_is_md5_of_text(spark):
    import hashlib

    rows = [(0, "hello world"), (1, "spark engine")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    media = MM.media_from_documents(docs, limit=32)
    out = {r.media_id: r for r in MM.decode_images(media).collect()}
    for i, text in rows:
        b = text.encode("utf-8")
        assert out[i].checksum == hashlib.md5(b).hexdigest()
        assert out[i].n_bytes == len(b)
        assert abs(out[i].mean_pixel - sum(b) / len(b)) < 1e-9
    assert out[0].width == 32 and out[1].width == 48


def test_decode_deterministic(media):
    a = sorted(MM.decode_images(media).collect())
    b = sorted(MM.decode_images(media).collect())
    assert a == b


def test_extract_features_unit_norm_and_feeds_topk(media):
    feats = MM.extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.embedding) == 16
        assert abs(float(np.linalg.norm(r.embedding)) - 1.0) < 1e-3
    # features flow into the standard vector operators unchanged
    q = rows[0].embedding
    from hybrid_vector_search_spark.functions.vector import dot_score_pandas_udf
    import pyspark.sql.functions as F

    scored = feats.select(
        F.col("media_id").alias("id"),
        dot_score_pandas_udf(q)(F.col("embedding")).alias("score"),
    )
    top = topk(scored, 3).collect()
    assert top[0].id == rows[0].media_id and abs(top[0].score - 1.0) < 1e-5


def test_resize_rewrites_meta_jvm_side(media):
    out = MM.resize_plan(media, 8, 8).select("meta.width", "meta.height")
    assert {(r.width, r.height) for r in out.collect()} == {(8, 8)}


def test_sample_frames_every_n(media):
    out = MM.sample_frames(media, every_n=8).collect()
    # only video rows fan out; n_frames is 24..28 → 3 or 4 kept frames
    assert {r.media_id // 100 for r in out} == {1}
    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in per.items():
        assert idxs == sorted(idxs) and idxs[0] == 0
        assert all(i % 8 == 0 for i in idxs)
    assert any(len(v) == 4 for v in per.values())


def test_decode_codec_dispatch_and_validation(media):
    import pytest as _pytest

    if not MM.codec_available():
        # auto resolves to the stub when PIL is absent; with PIL present
        # auto would run the REAL decoder, which rightly rejects the
        # fixture's synthetic non-image payloads — so the auto==stub
        # comparison only makes sense here
        a = sorted(MM.decode_images(media, codec="auto").collect())
        b = sorted(MM.decode_images(media, codec="stub").collect())
        assert a == b
    with _pytest.raises(ValueError, match="codec"):
        MM.decode_images(media, codec="jpeg")


def test_pil_decode_schema_parity(spark):
    """Real-codec path: skipped unless PIL is importable. Builds a real
    PNG, decodes through codec='pil', and asserts the output schema and
    payload-derived fields match the stub contract exactly."""
    import pytest as _pytest

    if not MM.codec_available():
        _pytest.skip("PIL not importable in this environment")
    import hashlib
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    arr = np.arange(48 * 32 * 3, dtype=np.uint8).reshape(32, 48, 3)
    Image.fromarray(arr).save(buf, format="PNG")
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [
            {
                "media_id": 1,
                "kind": "image",
                "data": payload,
                "meta": {
                    "format": "png",
                    "width": 48,
                    "height": 32,
                    "channels": 3,
                    "sample_rate": None,
                    "n_frames": 1,
                },
            }
        ],
        MM.MEDIA_SCHEMA,
    )
    real = MM.decode_images(media, codec="pil")
    stub = MM.decode_images(media, codec="stub")
    assert real.schema == stub.schema
    row = real.collect()[0]
    assert (row.width, row.height, row.channels) == (48, 32, 3)
    assert row.mean_pixel == float(arr.mean())
    assert row.checksum == hashlib.md5(payload).hexdigest()
    assert row.n_bytes == len(payload)


def test_audio_windows_fanout_and_clamp(spark):
    import pyspark.sql.functions as F

    # 16 kHz, 40_000 samples -> windows [0,16k) [16k,32k) [32k,40k)
    aud = MM.synth_media_table(spark, n=2, kind="audio").withColumn(
        "meta",
        F.struct(
            F.lit("wav").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(16_000).alias("sample_rate"),
            F.lit(40_000).alias("n_frames"),
        ),
    )
    out = MM.audio_windows(aud, window_s=1).collect()
    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r)
    assert set(per) == {0, 1}
    for rows in per.values():
        rows.sort(key=lambda r: r.window_idx)
        assert [r.start_sample for r in rows] == [0, 16_000, 32_000]
        assert rows[-1].end_sample == 40_000  # clamped
        assert abs(rows[-1].duration_ms - 500.0) < 1e-9
        assert all(r.end_sample - r.start_sample == 16_000 for r in rows[:-1])


def test_audio_windows_skips_payload_and_other_kinds(media):
    # images/videos don't fan out; the plan never projects `data`
    out = MM.audio_windows(media, window_s=1)
    assert out.count() == 0
    assert "data" not in out.columns
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "data" not in plan.lower().split("relation")[0]


def test_phash_stub_known_value(spark):
    import pyspark.sql.functions as F

    # 8 bytes: [0,0,0,0, 255,255,255,255] -> global mean 127.5, block
    # means per byte -> bits 4..7 set (LSB-first) = 0b11110000 = 240
    payload = bytes([0, 0, 0, 0, 255, 255, 255, 255])
    df = spark.createDataFrame(
        [(1, "image", payload)], "media_id LONG, kind STRING, data BINARY"
    )
    rows = MM.phash_stub(df, bits=8).collect()
    assert rows[0].phash == 240


def test_phash_stub_deterministic_and_filters_short(spark, media):
    a = sorted((r.media_id, r.phash) for r in MM.phash_stub(media).collect())
    b = sorted((r.media_id, r.phash) for r in MM.phash_stub(media).collect())
    assert a == b and len(a) == 12  # all fixture payloads are 256 bytes
    short = spark.createDataFrame(
        [(1, "image", bytes([1, 2, 3]))],
        "media_id LONG, kind STRING, data BINARY",
    )
    assert MM.phash_stub(short, bits=8).count() == 0  # < bits bytes

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits"):
        MM.phash_stub(media, bits=0)
    with _pytest.raises(ValueError, match="bits"):
        MM.phash_stub(media, bits=63)


def test_phash_and_windows_match_python_reference(spark):
    """Randomized cross-check: one Spark job over ~60 payloads (plus
    hand-picked edges) vs a pure-Python re-implementation of the same
    math — catches block-boundary and strict-comparison drift."""
    import random

    import pyspark.sql.functions as F

    def ref_phash(b: bytes, bits: int = 8) -> int:
        v, n = list(b), len(b)
        gm = sum(v) / n
        h = 0
        for j in range(bits):
            lo, hi = (j * n) // bits, ((j + 1) * n) // bits
            if sum(v[lo:hi]) / (hi - lo) > gm:
                h |= 1 << j
        return h

    rng = random.Random(42)
    payloads = [
        bytes([7] * 8),              # all-equal: no strict > anywhere -> 0
        bytes(range(8)),             # exactly one byte per block
        bytes(range(9)),             # uneven block boundaries
        bytes([255] * 4 + [0] * 5),  # skewed halves, odd length
        bytes([0, 255] * 128),       # alternating, 256 bytes
    ] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(8, 300)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, "image", p) for i, p in enumerate(payloads)],
        "media_id LONG, kind STRING, data BINARY",
    ).repartition(4)
    got = {r.media_id: r.phash for r in MM.phash_stub(df, bits=8).collect()}
    assert got == {i: ref_phash(p) for i, p in enumerate(payloads)}
    assert got[0] == 0

    def ref_windows(n: int, rate: int = 16_000) -> list[tuple]:
        return [
            (i, s, min(s + rate, n), (min(s + rate, n) - s) * 1000.0 / rate)
            for i, s in enumerate(range(0, n, rate))
        ]

    samples = [1, 15_999, 16_000, 16_001, 160_000] + [
        rng.randrange(1, 400_000) for _ in range(40)
    ]
    aud = spark.createDataFrame(
        [(i, "audio", None) for i in range(len(samples))],
        "media_id LONG, kind STRING, data BINARY",
    ).withColumn(
        "meta",
        F.struct(
            F.lit("wav").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(16_000).alias("sample_rate"),
            F.element_at(
                F.array(*[F.lit(s) for s in samples]),
                (F.col("media_id") + 1).cast("int"),
            ).cast("int").alias("n_frames"),
        ),
    )
    out = MM.audio_windows(aud, window_s=1).collect()
    per: dict[int, list] = {}
    for r in out:
        per.setdefault(r.media_id, []).append(
            (r.window_idx, r.start_sample, r.end_sample, r.duration_ms)
        )
    for i, n in enumerate(samples):
        assert sorted(per[i]) == ref_windows(n), (i, n)


def test_scene_cuts_matches_python_reference(media):
    """scene_cuts vs a pure-Python replay of luma → cut → scene
    assignment, plus the partition invariants every segmentation must
    hold (scenes tile the frame range exactly, no gaps or overlaps)."""
    import hashlib

    vids = media.filter("kind = 'video'")
    rows = vids.select("media_id", "data", "meta.n_frames").collect()
    thresh = 96

    def luma(mid: int, idx: int, payload: bytes) -> int:
        fp = hashlib.md5(payload).hexdigest()
        h = hashlib.md5(f"{mid}#{idx}:{fp}".encode()).hexdigest()
        return int(h[:2], 16)

    expected = []
    for r in rows:
        lumas = [luma(r.media_id, i, bytes(r.data)) for i in range(r.n_frames)]
        scene, start, vals = 0, 0, []
        for i, v in enumerate(lumas):
            cut = i == 0 or abs(v - lumas[i - 1]) > thresh
            if cut and i > 0:
                expected.append(
                    (r.media_id, scene, start, i - 1, i - start,
                     round(sum(vals) / len(vals), 6))
                )
                start, vals = i, []
            if cut:
                scene += 1
            vals.append(v)
        expected.append(
            (r.media_id, scene, start, r.n_frames - 1,
             r.n_frames - start, round(sum(vals) / len(vals), 6))
        )

    got = sorted(
        (x.media_id, x.scene_id, x.start_frame, x.end_frame,
         x.n_frames, x.mean_luma)
        for x in MM.scene_cuts(vids, threshold=thresh).collect()
    )
    assert got == sorted(expected)

    # tiling invariants: scene k+1 starts where scene k ended + 1
    per: dict[int, list] = {}
    for g in got:
        per.setdefault(g[0], []).append(g)
    nf = {r.media_id: r.n_frames for r in rows}
    for mid, scenes in per.items():
        scenes.sort(key=lambda s: s[1])
        assert scenes[0][1] == 1 and scenes[0][2] == 0
        for a, b in zip(scenes, scenes[1:]):
            assert b[2] == a[3] + 1 and b[1] == a[1] + 1
        assert scenes[-1][3] == nf[mid] - 1
        assert sum(s[4] for s in scenes) == nf[mid]


def test_zero_frame_videos_yield_no_frames(spark):
    # n_frames=0 (corrupt/empty video) must fan out to NOTHING — an
    # unguarded sequence(0, -1) descends and fabricates frames 0 and -1
    import pyspark.sql.functions as F

    vids = spark.createDataFrame(
        [(1, "video", b"x"), (2, "video", b"y")],
        "media_id LONG, kind STRING, data BINARY",
    ).withColumn(
        "meta",
        F.struct(
            F.lit("mp4").alias("format"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.when(F.col("media_id") == 1, 0)
            .otherwise(3)
            .cast("int")
            .alias("n_frames"),
        ),
    )
    sampled = MM.sample_frames(vids, every_n=1).collect()
    assert {r.media_id for r in sampled} == {2}
    scenes = MM.scene_cuts(vids).collect()
    assert {r.media_id for r in scenes} == {2}
    assert all(r.start_frame >= 0 for r in scenes)
