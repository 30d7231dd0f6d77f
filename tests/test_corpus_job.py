"""End-to-end corpus build (jobs/corpus_job.py): the full
crawl -> warc -> documents -> line_dedup -> exact/near dedup ->
quality filter -> split -> pack chain on the fixture web, with
planted duplicates — pins survivor counts, split sizes and
packed-sequence totals, and proves the chain is deterministic."""

import pyspark.sql.functions as F

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.jobs.corpus_job import build_corpus
from minicrawler_spark.sources.warc import write_warc
from minicrawler_spark.streaming.crawl import crawl

SEEDS = (
    ["http://host%d.test/page/%d" % (h, i)
     for h in range(3) for i in range(4)]
    # planted duplicates: /page/0N serves the same bytes as /page/N
    # under a distinct URL
    + ["http://host0.test/page/01", "http://host1.test/page/02"]
)

# image fetches ride the same crawl; their records must land in the
# MEDIA branch (warc_to_media -> decode_pixels) and never become
# mojibake text documents
MEDIA_SEEDS = [
    "http://host0.test/image/im3.png",
    "http://host1.test/image/im7.png",
]

# audio/video fetches ride the same crawl into the AV branches:
# sample_frames (MP4 key frames) and audio_features (WAV PCM)
AV_SEEDS = [
    "http://host0.test/audio/a1.wav",
    "http://host1.test/video/v1.mp4",
]


def _build(spark, tmp_path, name):
    out = str(tmp_path / name)
    raw = crawl(
        spark, SEEDS + MEDIA_SEEDS + AV_SEEDS,
        CrawlSettings(timeout=600, writehead=True),
    ).filter("outcome = 'done'")
    write_warc(raw, out).collect()
    return build_corpus(spark, out, pack_budget=512)


def test_corpus_build_end_to_end(spark, tmp_path):
    corpus = _build(spark, tmp_path, "warc")

    # every fetched page becomes a document
    n_docs = corpus["documents"].count()
    assert n_docs == len(SEEDS) == 14

    # line_dedup dropped corpus-wide boilerplate (the table line is
    # on every page, so with max_count=2 it is gone from every doc)
    ld = {r["doc_id"]: r["text"]
          for r in corpus["line_deduped"].collect()}
    assert len(ld) == 14
    assert all("cell A" not in t for t in ld.values())
    # but per-page content survived
    assert any("para 0 with" in t for t in ld.values())

    # the two planted exact duplicates collapse; min doc_id survives
    # (lexicographic: ".../page/01" < ".../page/1")
    surv = {r["doc_id"] for r in corpus["survivors"].collect()}
    assert len(surv) == 12
    assert "http://host0.test/page/01" in surv
    assert "http://host0.test/page/1" not in surv
    assert "http://host1.test/page/02" in surv
    assert "http://host1.test/page/2" not in surv

    # quality gates keep the real pages (long, low-repetition text)
    filt = corpus["filtered"]
    rows = filt.collect()
    assert {r["doc_id"] for r in rows} == surv
    assert all(r["quality"] >= 0.25 for r in rows)

    # split: every row named, sizes sum, content-addressed
    split = corpus["split"].select("doc_id", "split").collect()
    by = {}
    for r in split:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert sum(len(v) for v in by.values()) == len(surv)
    assert set(by) <= {"train", "val", "test"}

    # packing: train tokens conserved across sequences
    train_ids = by.get("train", set())
    packed = corpus["packed"].collect()
    from minicrawler_spark.operators.dedup import tokenize

    n_tok = (
        corpus["split"].filter(F.col("split") == "train")
        .select(F.sum(F.size(tokenize(F.col("text")))).alias("s"))
        .collect()[0]["s"]
    )
    assert sum(p["total_tokens"] for p in packed) == n_tok
    assert sum(p["n_docs"] for p in packed) == len(train_ids)
    assert [p["seq_id"] for p in packed] == sorted(
        p["seq_id"] for p in packed
    )

    # media branch: the image fetches landed in warc_to_media (and
    # ONLY there — documents stayed at 14 above), and decode_pixels
    # recovered the fixture PNGs' actual samples
    media = {r["media_ref"]: r for r in corpus["media"].collect()}
    assert set(media) == set(MEDIA_SEEDS + AV_SEEDS)
    kinds = {ref: r["kind"] for ref, r in media.items()}
    assert all(kinds[s] == "image" for s in MEDIA_SEEDS)
    assert kinds["http://host0.test/audio/a1.wav"] == "audio"
    assert kinds["http://host1.test/video/v1.mp4"] == "video"
    px = {r["media_ref"]: r for r in corpus["media_pixels"].collect()}
    assert set(px) == set(MEDIA_SEEDS)
    for ref, r in px.items():
        assert r["decode_error"] is None, r["decode_error"]
        assert (r["width"], r["height"], r["pixel_format"]) == (8, 8, "rgb8")
        from minicrawler_spark.operators.multimodal import _png_pixels

        _w, _h, _f, want = _png_pixels(bytes(media[ref]["data"]))
        assert bytes(r["pixels"]) == want
    feats = {r["media_ref"]: r
             for r in corpus["media_features"].collect()}
    # the features branch is image-only (AV assets go to the frame /
    # audio branches, not junk decode_error rows here)
    assert set(feats) == set(MEDIA_SEEDS)
    assert all(f["decode_error"] is None for f in feats.values())
    assert all(len(f["feature"]) == 64 for f in feats.values())

    # AV branch: MP4 key frames recovered as the exact encoded
    # sample bytes from the archived fixture container
    import hashlib as _hashlib

    from minicrawler_spark.sources.fixtures import _h as _fixh

    frames = [r for r in corpus["media_frames"].collect()]
    assert {f["media_ref"] for f in frames} == {
        "http://host1.test/video/v1.mp4"}
    assert [f["sample_number"] for f in frames] == [1, 3]  # sync only
    seed = _fixh("v1")
    want = [_hashlib.sha256(b"frame%d:%d" % (seed, i)).digest()[:10 + i]
            for i in range(3)]
    assert [bytes(f["data"]) for f in frames] == [want[0], want[2]]
    assert all(f["codec"] == "avc1" and f["is_sync"] == "yes"
               for f in frames)

    af = corpus["media_audio_features"].collect()
    assert len(af) == 1 and af[0]["media_ref"] == (
        "http://host0.test/audio/a1.wav")
    assert af[0]["decode_error"] is None
    # 400 samples @ 8 kHz, 25 ms window / 10 ms hop -> 3 windows
    assert af[0]["n_windows"] == 3
    assert len(bytes(af[0]["rms"])) == 3 * 4


def test_corpus_build_deterministic(spark, tmp_path):
    """Two full runs (separate archives, fresh lineage) produce
    identical survivor sets, splits and packing — everything is
    content-addressed, nothing depends on partitioning or RNG."""
    a = _build(spark, tmp_path, "warc_a")
    b = _build(spark, tmp_path, "warc_b")
    sa = {(r["doc_id"], r["split"])
          for r in a["split"].select("doc_id", "split").collect()}
    sb = {(r["doc_id"], r["split"])
          for r in b["split"].select("doc_id", "split").collect()}
    assert sa == sb
    pa = sorted(
        (r["seq_id"], r["n_docs"], r["total_tokens"],
         r["first_doc_id"], r["last_doc_id"])
        for r in a["packed"].collect()
    )
    pb = sorted(
        (r["seq_id"], r["n_docs"], r["total_tokens"],
         r["first_doc_id"], r["last_doc_id"])
        for r in b["packed"].collect()
    )
    assert pa == pb and pa


def test_corpus_job_script_mode_and_single_materialization(
    spark, tmp_path
):
    """The spark-submit entry form (`python .../corpus_job.py`) runs
    the file as __main__ with NO parent package — build_corpus and
    main() must not rely on relative imports. Loaded exactly as the
    interpreter would (runpy over the file path), then main() is
    driven end-to-end against a real archive and its parquet outputs
    checked for consistency."""
    import io
    import json
    import runpy
    from contextlib import redirect_stdout

    import minicrawler_spark.jobs.corpus_job as cj

    mod = runpy.run_path(cj.__file__)  # run_name != package: script
    out = str(tmp_path / "warc")
    raw = crawl(
        spark, SEEDS[:6],
        CrawlSettings(timeout=600, writehead=True),
    ).filter("outcome = 'done'")
    write_warc(raw, out).collect()

    corpus = str(tmp_path / "corpus")
    wet = str(tmp_path / "wet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = mod["main"](
            ["--archive", out, "--output", corpus,
             "--pack-budget", "512", "--wet", wet,
             "--bpe-merges", "32"]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    # split is the (scrubbed) final corpus + the split column; packed
    # sequences cover the train split's tokens at the budget
    assert summary["rows"]["split"] == summary["rows"]["corpus"] > 0
    assert sum(summary["splits"].values()) == summary["rows"]["split"]
    corpus_pq = spark.read.parquet(corpus + "/corpus")
    split = spark.read.parquet(corpus + "/split")
    assert set(split.columns) - set(corpus_pq.columns) == {"split"}
    # the default chain PII-scrubs before split: audit counts ride
    # the rows (zero on the PII-free fixture corpus, text unchanged)
    for c in ("n_emails", "n_ipv4s", "n_ids"):
        assert c in split.columns
        assert split.agg(F.sum(c)).collect()[0][0] == 0
    packed = spark.read.parquet(corpus + "/packed")
    assert packed.count() == summary["rows"]["packed"] > 0
    # --wet exported the corpus text as conversion archives
    from minicrawler_spark.sources.warc import read_wet

    assert summary["wet_files"] >= 1
    got_wet = {r["doc_id"]: r["text"]
               for r in read_wet(spark, wet).collect()}
    want_wet = {r["doc_id"]: r["text"]
                for r in split.select("doc_id", "text").collect()}
    assert got_wet == want_wet
    # --bpe-merges: tokenizer trained on the train split, encoded
    # pieces reproduce each doc's lowercased token stream
    merges = spark.read.parquet(corpus + "/tokenizer_merges")
    assert merges.count() == summary["bpe_merges"] == 32
    encoded = spark.read.parquet(corpus + "/encoded")
    n_train = split.filter("split = 'train'").count()
    assert encoded.count() == summary["encoded_docs"] == n_train
    sample = encoded.limit(5).collect()
    texts = {r["doc_id"]: r["text"] for r in split.collect()}
    for r in sample:
        want = "".join(texts[r["doc_id"]].lower().split())
        assert "".join(r["pieces"]) == want
