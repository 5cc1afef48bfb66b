"""Multimodal column operators (north-star LLM-pipeline surface).

Media payloads are opaque `binary` columns with typed metadata structs —
the lakehouse-native layout for image/audio/video at 100 TB (payload
bytes stay columnar-compressed; metadata prunes). Decode / feature
extraction runs as Arrow-batched mapInPandas so bytes cross to Python
once per batch, not per row.

STUB NOTE: real image/audio decoders are not in this container, so the
decode step is a clearly-marked deterministic fake (dimensions derived
from doc_id). The Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and is what these queries test.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import functions as F

from ..registry import register
from ._util import t


def _assembled(spark, sf_dir):
    """documents ⋈ embeddings → multimodal rows: binary payload + typed
    metadata struct + embedding vector."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.col("text").cast("binary").alias("payload"),
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("source"),
                F.col("n_chars").alias("n_chars"),
            ).alias("meta"),
            "embedding",
            "label",
        )
    )


@register(
    "q_multimodal_cols",
    family="multimodal",
    oracle="""
    SELECT d.doc_id,
           octet_length(encode(d.text))  AS payload_bytes,
           d.lang                        AS meta_lang,
           CAST(len(e.embedding) AS INTEGER) AS emb_dim,
           e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="Mixed-modality row assembly: binary payload + metadata struct + "
    "vector, then typed field access. Output flattens to scalars so the "
    "oracle can hash it.",
)
def q_multimodal_cols(spark, sf_dir):
    m = _assembled(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.lang").alias("meta_lang"),
        F.size("embedding").alias("emb_dim"),
        "label",
    )


_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, media_type string"
)


def decode_stub_batches():
    """Return the STUB decoder (mapInPandas body) as a closure so
    cloudpickle serializes it BY VALUE — a module-level function is
    pickled by reference and breaks on workers that don't have this
    repo on sys.path. Deterministic fake: a real build would call
    PIL/ffmpeg on the payload bytes here; dims derive from doc_id so
    the oracle can verify the plumbing end-to-end."""

    def _batches(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": (16 + ids % 64).astype("int32"),
                    "height": (16 + (ids * 7) % 64).astype("int32"),
                    "n_frames": (1 + ids % 30).astype("int32"),
                    "media_type": [
                        "video" if i % 3 == 0 else ("image" if i % 3 == 1 else "audio")
                        for i in ids
                    ],
                }
            )

    return _batches


@register(
    "q_multimodal_decode",
    family="multimodal",
    oracle="""
    SELECT doc_id,
           CAST(16 + doc_id % 64 AS INTEGER)       AS width,
           CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
           CAST(1 + doc_id % 30 AS INTEGER)        AS n_frames,
           CASE WHEN doc_id % 3 = 0 THEN 'video'
                WHEN doc_id % 3 = 1 THEN 'image'
                ELSE 'audio' END                    AS media_type
    FROM documents
    """,
    doc="Decode/feature-extract over binary payloads via Arrow-batched "
    "mapInPandas (decode itself is a documented deterministic STUB — "
    "see module docstring; the oracle checks the real Spark plumbing).",
)
def q_multimodal_decode(spark, sf_dir):
    m = _assembled(spark, sf_dir).select("doc_id", "payload")
    return m.mapInPandas(decode_stub_batches(), _DECODE_SCHEMA)


@register(
    "q_multimodal_framesample",
    family="multimodal",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, 1 + doc_id % 30, 5)) AS INTEGER) AS frame_idx,
           CAST(1 + doc_id % 30 AS INTEGER) AS n_frames
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="Frame sampling: every-5th-frame index expansion for video rows "
    "(explode of a generated sequence — row-count amplification stays "
    "JVM-side; the downstream per-frame decode is where mapInPandas "
    "takes over).",
)
def q_multimodal_framesample(spark, sf_dir):
    vids = q_multimodal_decode(spark, sf_dir).filter(F.col("media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))
    return vids.select(
        "doc_id", F.explode(idx).alias("frame_idx"), "n_frames"
    )


@register(
    "q_multimodal_features",
    family="multimodal",
    oracle=None,  # byte entropy/stats not SQL-expressible → rows-only
    doc="Feature extraction over binary payloads — REAL compute, not a "
    "stub: per-payload byte count, distinct-byte count, mean byte "
    "value, and Shannon entropy (bits/byte), via numpy bincount per "
    "Arrow batch. The schema/batching pattern is exactly what a CLIP/"
    "whisper embedding pass would use; pinned by a unit test with "
    "hand-computed values (tests/test_multimodal_features).",
)
def q_multimodal_features(spark, sf_dir):
    m = _assembled(spark, sf_dir).select("doc_id", "payload")

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, nb, nd, mean, ent = [], [], [], [], []
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / len(b)
                ids.append(i)
                nb.append(len(b))
                nd.append(int((counts > 0).sum()))
                mean.append(round(float(b.mean()), 6))
                ent.append(round(float(-(p * np.log2(p)).sum()), 6))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": nb,
                    "n_distinct_bytes": nd,
                    "mean_byte": mean,
                    "entropy_bits": ent,
                }
            )

    return m.mapInPandas(
        feats,
        "doc_id bigint, n_bytes bigint, n_distinct_bytes int, "
        "mean_byte double, entropy_bits double",
    )


@register(
    "q_multimodal_resize",
    family="multimodal",
    oracle="""
    SELECT doc_id,
           CAST(16 + doc_id % 64 AS INTEGER)             AS width,
           CAST(16 + (doc_id * 7) % 64 AS INTEGER)       AS height,
           CAST((16 + doc_id % 64) // 2 AS INTEGER)      AS new_width,
           CAST((16 + (doc_id * 7) % 64) // 2 AS INTEGER) AS new_height,
           CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT)
             AS resized_bytes
    FROM documents WHERE doc_id % 3 = 1
    """,
    doc="Resize for image rows: target dims = half of the (stub-) "
    "decoded dims; the payload transform is 4:1 byte decimation "
    "(payload[::4] — REAL byte-level compute standing in for the "
    "pixel resample a PIL build would do; deterministic, so the "
    "byte count is oracle-checked). Batched bytes-in/bytes-out "
    "through one mapInPandas pass — the resize never ships a row at "
    "a time.",
)
def q_multimodal_resize(spark, sf_dir):
    imgs = (
        _assembled(spark, sf_dir)
        .select("doc_id", "payload")
        .join(
            q_multimodal_decode(spark, sf_dir).select(
                "doc_id", "width", "height", "media_type"
            ),
            "doc_id",
        )
        .filter(F.col("media_type") == "image")
    )

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": (pdf["width"] // 2).astype("int32"),
                    "new_height": (pdf["height"] // 2).astype("int32"),
                    "resized_bytes": [
                        len(bytes(p)[::4]) for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return imgs.mapInPandas(
        resize,
        "doc_id bigint, width int, height int, new_width int, "
        "new_height int, resized_bytes bigint",
    )


@register(
    "q_multimodal_dedup",
    family="multimodal",
    oracle="""
    WITH hashed AS (
      -- sha256 over the UTF-8 bytes: DuckDB's VARCHAR overload hashes
      -- exactly the bytes Spark's sha2(CAST(... AS BINARY), 256) sees
      SELECT doc_id, sha256(substr(text, 1, 16)) AS content_hash
      FROM documents
    )
    SELECT content_hash,
           count(*)     AS n_copies,
           min(doc_id)  AS keeper
    FROM hashed
    GROUP BY content_hash
    HAVING count(*) > 1
    """,
    doc="Exact binary dedup over opaque media payloads — the "
    "byte-identical tier of image/audio dedup (same file uploaded "
    "twice), run before any perceptual hashing: sha2 over the binary "
    "column, groupBy the 32-byte digest, keep min doc_id. The blobs "
    "here are 16-byte text-prefix stand-ins (the fixture corpus has "
    "no byte-identical full payloads), which also models thumbnail "
    "collisions. Identical shape to q_dedup_exact: the shuffle "
    "carries digests, never payloads — at 100 TB of media the "
    "exchange is ~n x 32 bytes regardless of blob size.",
)
def q_multimodal_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id", F.substring("text", 1, 16).cast("binary").alias("payload")
    )
    return (
        blobs.select("doc_id", F.sha2("payload", 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


_PHASH_BITS = 64
_PHASH_BANDS = 4  # 16 bits each — one collision band ⇒ candidate
_PHASH_MAX_HAMMING = 6
# Per-(band,val) bucket cap for the dup-clusters candidate join — the
# same valve every text-LSH sibling carries (operators/dedup.py
# MAX_LSH_BUCKET): a degenerate band value (constant-payload boilerplate
# media) makes one bucket quadratic at 100 TB; standard LSH practice
# skips buckets above the cap. Mirrored in the union-find pin
# (tests/test_multimodal.py) and exercised by a synthetic hot-bucket test.
_PHASH_MAX_BUCKET = 64


def phash64_batches():
    """Arrow-batched aHash: payload bytes → 64 mean-bucket sign bits.

    Stand-in for pixel-domain aHash/pHash (no image decoder in this
    container): the byte stream plays the role of the decoded+resized
    grayscale plane, which exercises the REAL pipeline shape — bytes
    cross to Python once per Arrow batch, a numpy kernel folds each
    payload to a 64-bit signature, and everything downstream (banding,
    hamming verify) is JVM-side. Swap the kernel body for
    PIL+DCT when a decoder is available; nothing else changes."""
    import numpy as np
    import pandas as pd

    def _batches(batches):
        for pdf in batches:
            sigs = []
            for payload in pdf["payload"]:
                a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                if len(a) < _PHASH_BITS:  # pad short payloads
                    a = np.pad(a, (0, _PHASH_BITS - len(a)))
                # mean per bucket (truncate the ragged tail), then sign
                # vs the global mean — classic aHash
                n = (len(a) // _PHASH_BITS) * _PHASH_BITS
                buckets = a[:n].reshape(_PHASH_BITS, -1).mean(axis=1)
                bits = (buckets > buckets.mean()).astype(np.uint64)
                sig = 0
                for b in bits:
                    sig = (sig << 1) | int(b)
                # store as signed int64 (Spark LongType)
                sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": sigs})

    return _batches


@register(
    "q_multimodal_phash",
    family="multimodal",
    oracle=None,  # numpy kernel — pinned by tests/test_multimodal.py
    doc="Perceptual-hash near-duplicate detection for media payloads — "
    "the second tier above q_multimodal_dedup's byte-exact sha2: "
    "64-bit aHash per payload (Arrow-batched numpy, see "
    "phash64_batches), then banded LSH on 4x16-bit hash bands "
    "(hamming-near pairs must collide on >=1 band when distance "
    "<= 16·(bands-1)/bands — same banding math as q_dedup_simhash) "
    "and a JVM-side hamming verify: bit_count(a XOR b) <= 6. "
    "Scale: signatures are 8 bytes/payload, band join is an "
    "equi-join on (band, value16) — never all-pairs; verify touches "
    "only band-colliding candidates. One GEMM-free pass; the "
    "expensive bytes never shuffle.",
)
def q_multimodal_phash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    sigs = blobs.mapInPandas(phash64_batches(), "doc_id long, phash long")
    bands = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .distinct()  # same pair can collide on several bands
    )
    return pairs.orderBy("doc_a", "doc_b")


@register(
    "q_multimodal_shard_pack",
    family="multimodal",
    oracle="""
    WITH b AS (
      SELECT d.doc_id, octet_length(encode(d.text)) AS nb
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT doc_id,
           CAST(nb AS BIGINT) AS n_bytes,
           CAST((sum(nb) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nb)
                // 16384 AS BIGINT) AS shard_id
    FROM b
    """,
    doc="Blob shard packing: assign each media payload to a "
    "~16 KiB-bounded training shard by exclusive-prefix BYTE count — "
    "the webdataset/tar-shard layout step for multimodal corpora, "
    "where shard byte size (not document count) bounds both the "
    "downstream reader's memory and the object-store request "
    "granularity. Reuses q_pack_tokens' two-pass distributed prefix "
    "sum (range partition -> O(#partitions) subtotals to the driver "
    "-> broadcast offsets -> partition-local cumsum) with payload "
    "octet_length as the weight, so there is NO single-reducer global "
    "window at any scale; the oracle is the straightforward global "
    "window over the same byte counts.",
)
def q_multimodal_shard_pack(spark, sf_dir):
    from .pipeline import pack_shards

    blobs = _assembled(spark, sf_dir).select("doc_id", "payload")
    return pack_shards(
        blobs, budget=16384, weight=F.octet_length("payload").cast("long")
    ).select("doc_id", F.col("n_tokens").alias("n_bytes"), "shard_id")


@register(
    "q_multimodal_aspect_bucket",
    family="multimodal",
    oracle="""
    WITH dims AS (
      -- deterministic STUB dims (no decoder in this container): same
      -- doc_id-derived fake as decode_stub_batches, mirrored here so
      -- the oracle verifies the bucketing arithmetic end-to-end
      SELECT d.doc_id,
             CAST(256 + (d.doc_id % 97) * 8 AS BIGINT) AS w,
             CAST(256 + (d.doc_id % 71) * 8 AS BIGINT) AS h
      FROM documents d
    ),
    b AS (
      SELECT doc_id, w, h,
             -- 0.22314355131420976 == ln(1.25) as an exact shared literal
             -- (one engine's libm could differ by 1 ulp from the other's)
             least(greatest(CAST(floor(ln(w * 1.0 / h)
                                       / 0.22314355131420976) AS BIGINT),
                            -4), 4) AS bucket
      FROM dims
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(min(w * h) AS BIGINT) AS min_pixels,
           CAST(max(w * h) AS BIGINT) AS max_pixels,
           round(sum(w * 1.0) / sum(h), 6) + 0.0 AS mean_aspect_w
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Aspect-ratio bucketing for image-batch training (the SDXL-"
    "style trick: group images into log-spaced aspect buckets so each "
    "GPU batch shares one padded shape — mixed aspects waste ~30% of "
    "pixels as padding): bucket = floor(ln(w/h)/ln(1.25)) clamped to "
    "±4, with per-bucket counts and pixel ranges — the table a "
    "dataloader partitions by. Dims come from the SAME deterministic "
    "doc_id-derived stub as q_multimodal_decode (no real decoder in "
    "this container — the bucketing arithmetic, grouping and oracle "
    "parity are what's tested; swap the dims CTE for real decode "
    "output in production). Exactness: dims and pixel counts exact "
    "ints; the bucket floor is ulp-stable away from bin edges "
    "(measure-zero, the standard binning stance); mean aspect is one "
    "weighted-rational division of exact sums. Scale: pure map + one "
    "combinable ≤9-cell agg; no shuffle beyond the 9 groups. Ref: "
    "reference treats media as opaque (docs/design.md:418 binary "
    "passthrough); north-star multimodal tier.",
)
def q_multimodal_aspect_bucket(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    dims = d.select(
        "doc_id",
        (256 + (F.col("doc_id") % 97) * 8).cast("long").alias("w"),
        (256 + (F.col("doc_id") % 71) * 8).cast("long").alias("h"),
    )
    b = dims.select(
        "doc_id",
        "w",
        "h",
        F.least(
            F.greatest(
                F.floor(
                    F.log(F.col("w") * 1.0 / F.col("h"))
                    / F.lit(0.22314355131420976)  # ln(1.25), shared literal
                ).cast("long"),
                F.lit(-4),
            ),
            F.lit(4),
        ).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min(F.col("w") * F.col("h")).cast("long").alias("min_pixels"),
            F.max(F.col("w") * F.col("h")).cast("long").alias("max_pixels"),
            (
                F.round(F.sum(F.col("w") * 1.0) / F.sum(F.col("h")), 6) + 0.0
            ).alias("mean_aspect_w"),
        )
        .orderBy("bucket")
    )


@register(
    "q_multimodal_dup_clusters",
    family="multimodal",
    oracle=None,  # numpy phash kernel upstream — pinned by tests/test_multimodal.py
    doc="Near-duplicate MEDIA clusters: q_multimodal_phash's banded "
    "hamming pairs (aHash signatures over the payload bytes, 4x16-bit "
    "LSH bands, bit_count verify <= 6) fed through the shared "
    "hash-min connected-components kernel "
    "(functions.graph_algs.connected_components — the q_dedup_clusters "
    "engine), emitting one row per member with its cluster id (the "
    "minimum doc_id, the deterministic canonical representative) and "
    "the cluster size — the keep-one-per-cluster table a multimodal "
    "pipeline dedups against, where q_multimodal_phash stops at raw "
    "pairs. Scale: signatures are 8 bytes/payload, pair candidates "
    "ride the band equi-join (never all-pairs) behind a per-(band,val) "
    "bucket cap (_PHASH_MAX_BUCKET=64, the text-LSH valve mirrored: "
    "degenerate boilerplate buckets are quadratic and are dropped "
    "whole), components converge "
    "in O(log diameter) supersteps with lineage cuts; the expensive "
    "payload bytes never shuffle. Rows-only by design (the aHash "
    "kernel is numpy); values pinned against a pure-Python "
    "reference + set-law invariants in tests/test_multimodal.py.",
)
def q_multimodal_dup_clusters(spark, sf_dir):
    from ..functions.graph_algs import connected_components

    d = t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    sigs = blobs.mapInPandas(phash64_batches(), "doc_id long, phash long")
    sigs = sigs.localCheckpoint(eager=False)  # both band-join sides read it
    bands = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    # Oversized-bucket valve (r10, VERDICT r9 task #3): drop band rows in
    # buckets past _PHASH_MAX_BUCKET before the self-join — a hot
    # (band,val) is quadratic in candidates at 100 TB. Bucket counting is
    # a map-side-combinable agg; the hot set is tiny → broadcast
    # anti-join, no extra shuffle on the signature side. Mirrored in the
    # union-find pin (tests/test_multimodal.py).
    hot = (
        bands.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > _PHASH_MAX_BUCKET)
        .select("band", "val")
    ).localCheckpoint(eager=True)  # computed once, read by both join sides
    bands = bands.join(F.broadcast(hot), ["band", "val"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            <= _PHASH_MAX_HAMMING
        )
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = connected_components(edges)  # (node, comp)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
        )
        .orderBy("cluster_id", "doc_id")
    )
