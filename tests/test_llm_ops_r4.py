"""Behavioral tests for the round-4 corpus ops (segment-level dedup,
temperature source mixing, bigram-LM scoring). Oracle parity is covered
by the parametrized sweeps in test_prep_ops.py / the digest tests; these
pin the semantics on constructed corpora."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def docs_dir(tmp_path):
    def write(rows):
        pd.DataFrame(
            [
                {"doc_id": i, "text": t, "lang": lang, "source": src,
                 "n_chars": len(t)}
                for i, (t, lang, src) in enumerate(rows)
            ]
        ).to_parquet(tmp_path / "documents.parquet")
        return str(tmp_path)

    return write


def test_segment_dedup_drops_repeats_keeps_first(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.prep import SEG_W, corpus_segment_dedup

    boiler = " ".join(f"b{i}" for i in range(SEG_W))       # one exact segment
    uniq_a = " ".join(f"a{i}" for i in range(SEG_W))
    uniq_c = " ".join(f"c{i}" for i in range(SEG_W))
    # doc 0: boiler + unique; doc 1: boiler + unique (boiler is a repeat);
    # doc 2: doc 0 verbatim (every segment drops)
    sf = docs_dir([
        (f"{boiler} {uniq_a}", "en", "s"),
        (f"{boiler} {uniq_c}", "en", "s"),
        (f"{boiler} {uniq_a}", "en", "s"),
    ])
    rows = {r.doc_id: r for r in corpus_segment_dedup(spark, sf).collect()}
    assert rows[0].n_segments == 2 and rows[0].n_kept_segments == 2
    assert rows[1].n_segments == 2 and rows[1].n_kept_segments == 1
    assert rows[1].n_dropped_segments == 1
    assert rows[2].n_kept_segments == 0  # full duplicate: nothing survives
    # kept text of doc 1 is exactly its unique segment
    import hashlib

    assert rows[1].kept_md5 == hashlib.md5(uniq_c.encode()).hexdigest()
    assert rows[2].kept_md5 == hashlib.md5(b"").hexdigest()


def test_segment_dedup_first_occurrence_within_doc(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.prep import SEG_W, corpus_segment_dedup

    seg = " ".join(f"x{i}" for i in range(SEG_W))
    sf = docs_dir([(f"{seg} {seg}", "en", "s")])  # same segment twice
    r = corpus_segment_dedup(spark, sf).collect()[0]
    assert (r.n_segments, r.n_kept_segments, r.n_dropped_segments) == (2, 1, 1)


def test_mix_sample_downweights_large_sources(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.prep import corpus_mix_sample

    # 160 docs in 'big', 10 in 'small': sqrt weighting must give the
    # small source a HIGHER keep rate than the big one.
    rows = [("tok " + "w" * (i % 3), "en", "big") for i in range(160)]
    rows += [("tok " + "w" * (i % 3), "en", "small") for i in range(10)]
    sf = docs_dir(rows)
    out = {r.source: r for r in corpus_mix_sample(spark, sf).collect()}
    assert out["big"].n_docs == 160 and out["small"].n_docs == 10
    assert out["small"].rate_bp > out["big"].rate_bp
    # budget respected: total target ≤ half the corpus
    assert out["big"].target_docs + out["small"].target_docs <= 85
    # sampled counts are the deterministic hash-threshold population
    for r in out.values():
        assert 0 <= r.n_sampled <= r.n_docs


def test_lm_score_ranks_fluent_above_shuffled(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.text import text_lm_score

    # A corpus dominated by one repeated fluent phrase: docs made of the
    # phrase have high-probability transitions; a doc of the same tokens
    # in scrambled order has rare transitions and must score lower.
    phrase = "the cat sat on the mat"
    scrambled = "mat the on cat the sat"
    sf = docs_dir(
        [(phrase, "en", "s")] * 8 + [(scrambled, "en", "s")] + [("solo", "en", "s")]
    )
    rows = {r.doc_id: r for r in text_lm_score(spark, sf).collect()}
    fluent = rows[0]
    shuffled = rows[8]
    single = rows[9]
    assert fluent.mean_cond_bp > shuffled.mean_cond_bp
    assert fluent.lm_band == "head" and shuffled.lm_band == "tail"
    assert single.n_pairs == 0 and single.lm_band == "empty"


def test_emb_project_preserves_norms_in_expectation(spark, sf_dir):
    """JL contract: the ±1 projection preserves squared norms up to
    bounded distortion — the per-vector ratio concentrates near 1 and
    its corpus mean lands well inside [0.7, 1.3]."""
    from dbt_jaffleshop_spark.llm.prep import emb_project

    pdf = emb_project(spark, sf_dir).toPandas()
    assert (pdf.n_dims == 64).all()
    nonzero = pdf[pdf.orig_norm_q > 0]
    assert 0.7 < nonzero.jl_distortion.mean() < 1.3
    # distortion is the ratio of the two integer norms, recomputed
    recomputed = nonzero.proj_norm_q / (16.0 * nonzero.orig_norm_q)
    assert (abs(recomputed - nonzero.jl_distortion) < 1e-12).all()


def test_events_stickiness_bounds_and_first_day(spark, sf_dir):
    """DAU ≤ WAU always (the window contains the day), so stickiness ≤ 1;
    on the first activity day the trailing window holds only that day, so
    DAU == WAU exactly."""
    from dbt_jaffleshop_spark.llm.events import events_stickiness

    pdf = events_stickiness(spark, sf_dir).toPandas().sort_values("day")
    assert (pdf.dau <= pdf.wau).all()
    assert (pdf.stickiness <= 1.0).all()
    first = pdf.iloc[0]
    assert first.dau == first.wau and first.stickiness_milli == 1000


def test_session_window_gap_boundary_semantics(spark, tmp_path):
    """Spark's session_window MERGES an event landing exactly on
    last_ts + gap (empirically pinned here) — its break rule is
    `> gap`, identical to the lag-based batch/custom operators, which
    is what lets the streaming twin share their oracle family."""
    import pandas as pd

    from dbt_jaffleshop_spark.llm.events import SESSION_GAP_US
    from dbt_jaffleshop_spark.streaming.sessionize import (
        streaming_session_window,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(microseconds=SESSION_GAP_US)
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            # user 1: second event at EXACTLY the gap → still ONE session;
            # user 2: second event 1µs past the gap → two sessions
            "ts": [base, base + gap, base, base + gap + pd.Timedelta(microseconds=1)],
            "user_id": [1, 1, 2, 2],
            "event_type": ["view"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = streaming_session_window(spark, str(tmp_path)).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 1 and per_user[1][0].n_events == 2
    assert len(per_user[2]) == 2
    # session end = last event ts + gap
    solo = sorted(per_user[2], key=lambda r: r.session_start_us)[0]
    assert solo.session_end_us == solo.session_start_us + SESSION_GAP_US


def test_image_header_decode_dependency_free():
    """PNG/BMP/GIF metadata decodes WITHOUT any codec library —
    container-header parsing over crafted valid files, including a
    2-frame animated GIF whose frame count requires walking the block
    structure (0x2C bytes inside pixel data must not count)."""
    import struct
    import zlib

    from dbt_jaffleshop_spark.llm.multimodal import decode_media

    # --- minimal complete PNG (12×7), CRC-correct
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 12, 7, 8, 0, 0, 0, 0)
    raw = zlib.compress(b"".join(b"\x00" + b"\x00" * 12 for _ in range(7)))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    assert decode_media(png, "image") == {
        "width": 12, "height": 7, "n_frames": 1,
    }

    # --- BMP with a top-down (negative height) BITMAPINFOHEADER
    bmp = (
        b"BM" + struct.pack("<IHHI", 122, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 9, -5, 1, 24, 0, 68, 0, 0, 0, 0)
    )
    assert decode_media(bmp, "image") == {
        "width": 9, "height": 5, "n_frames": 1,
    }

    # --- 2-frame GIF89a with a global color table and GCE extensions;
    #     pixel sub-block content includes a 0x2C byte (must not count)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    frame = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 2) + b"\x00"  # descriptor
        + b"\x02" + b"\x02\x2c\x01" + b"\x00"  # LZW min + 2-byte sub-block
    )
    gif = (
        b"GIF89a" + struct.pack("<HH", 3, 2) + b"\x80\x00\x00"
        + b"\x00" * 6  # global color table (2 entries)
        + gce + frame + gce + frame + b"\x3b"
    )
    assert decode_media(gif, "image") == {
        "width": 3, "height": 2, "n_frames": 2,
    }


def test_bpe_merges_on_planted_corpus(spark, docs_dir):
    """Hand-computable BPE: a corpus where the pair frequencies (and the
    greedy non-overlap semantics on an 'aaaa' run) are known exactly.
    'aaaa' ×3 contributes 9 (a,a) pairs; 'ab' ×5 contributes 5 (a,b) —
    round 1 merges (a,a). Round 2's counts come from the re-segmented
    words: 'aaaa' → [aa, aa], so (aa,aa) has count 3; 'ab' is still
    [a, b] with 5 — (a,b) wins round 2."""
    from dbt_jaffleshop_spark.llm.prep import bpe_train_merges

    rows = [("aaaa aaaa aaaa", "en", "s"), ("ab ab ab ab ab", "en", "s")]
    out = {r.round: r for r in bpe_train_merges(spark, docs_dir(rows)).collect()}
    r1 = out[1]
    assert (r1.merge_left, r1.merge_right, r1.pair_count, r1.merged_symbol) == (
        "a", "a", 9, "aa",
    )
    r2 = out[2]
    assert (r2.merge_left, r2.merge_right, r2.pair_count) == ("a", "b", 5)
    # round 3: the re-segmented 'aaaa' = [aa, aa] pair
    r3 = out[3]
    assert (r3.merge_left, r3.merge_right, r3.pair_count) == ("aa", "aa", 3)


def test_bpe_segment_stats_applies_learned_merges(spark, docs_dir):
    """Apply phase: on the planted corpus the learned merges collapse
    'aaaa' to ONE token (rounds merge (a,a) then (aa,aa)) and 'ab' to
    one token (round 2), so the per-doc BPE token counts are exact."""
    from dbt_jaffleshop_spark.llm.prep import bpe_segment_stats

    rows = [("aaaa aaaa aaaa", "en", "s"), ("ab ab ab ab ab", "en", "s")]
    out = {r.doc_id: r for r in bpe_segment_stats(spark, docs_dir(rows)).collect()}
    d0, d1 = out[0], out[1]
    assert (d0.n_tokens, d0.n_bpe_tokens, d0.n_chars) == (3, 3, 12)
    assert (d1.n_tokens, d1.n_bpe_tokens, d1.n_chars) == (5, 5, 10)
    assert abs(d0.bpe_per_char - 0.25) < 1e-12  # 3 tokens / 12 chars


def test_pipeline_verdict_gate_consistency(spark, sf_dir):
    """The composed verdict must agree with its member operators: keep
    is exactly the gate conjunction, eval-holdout docs are never kept,
    and each gate column matches the standalone operator's answer."""
    from dbt_jaffleshop_spark.llm.corpus import corpus_curate
    from dbt_jaffleshop_spark.llm.prep import (
        DECON_EVAL_MOD,
        corpus_pipeline_verdict,
    )

    pdf = corpus_pipeline_verdict(spark, sf_dir).toPandas()
    assert (
        pdf.keep
        == (pdf.keep_curate & pdf.keep_decontam
            & pdf.keep_segment & pdf.keep_sampled)
    ).all()
    assert not pdf[pdf.is_eval_holdout].keep.any()
    assert (pdf.is_eval_holdout == (pdf.doc_id % DECON_EVAL_MOD == 0)).all()
    cur = corpus_curate(spark, sf_dir).toPandas().set_index("doc_id").keep
    merged = pdf.set_index("doc_id").keep_curate
    assert (merged.loc[cur.index] == cur).all()


def test_wav_decode_through_arrow_plumbing(spark, tmp_path):
    """REAL audio decoding end-to-end: craft 16-bit PCM WAV files (a
    1 kHz-amplitude square wave and a silent stereo clip), push them
    through the actual mapInPandas operator, and check exact sample
    counts, duration, and integer RMS. A non-WAV payload drops out."""
    import struct

    import pandas as pd

    from dbt_jaffleshop_spark.llm.multimodal import audio_features, parse_wav

    def wav(rate, channels, frames):
        data = b"".join(
            struct.pack("<" + "h" * channels, *f) for f in frames
        )
        fmt = struct.pack(
            "<HHIIHH", 1, channels, rate,
            rate * channels * 2, channels * 2, 16,
        )
        body = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # 8000 Hz mono square wave at ±1000: RMS exactly 1000; 4000 samples
    square = wav(8000, 1, [((1000 if i % 2 == 0 else -1000),)
                           for i in range(4000)])
    silent = wav(44100, 2, [(0, 0)] * 441)  # 10 ms of stereo silence
    assert parse_wav(square)["rms_q"] == 1000

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [square, silent, b"not audio at all"],
        }
    ).to_parquet(tmp_path / "audio.parquet")
    media = spark.read.parquet(str(tmp_path / "audio.parquet"))
    rows = {r.doc_id: r for r in audio_features(media).collect()}
    assert set(rows) == {1, 2}  # the non-WAV payload dropped out
    sq = rows[1]
    assert (sq.sample_rate, sq.n_channels, sq.n_samples) == (8000, 1, 4000)
    assert sq.duration_ms == 500 and sq.rms_q == 1000
    st = rows[2]
    assert (st.sample_rate, st.n_channels, st.n_samples) == (44100, 2, 441)
    assert st.duration_ms == 10 and st.rms_q == 0


def test_mp4_header_decode_dependency_free():
    """MP4 metadata decodes without a codec library: a crafted
    ftyp+moov file with an mvhd (timescale 1000, duration 2500) and two
    trak boxes reports 2500 ms and 2 tracks, through decode_media's
    video path; a version-1 mvhd (64-bit times) parses too."""
    import struct

    from dbt_jaffleshop_spark.llm.multimodal import decode_media

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd0 = (
        bytes([0]) + b"\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">I", 1000) + struct.pack(">I", 2500) + b"\x00" * 76
    )
    trak = box(b"trak", b"\x00" * 16)
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(
        b"moov", box(b"mvhd", mvhd0) + trak + trak
    )
    assert decode_media(mp4, "video") == {
        "duration_ms": 2500, "n_tracks": 2,
    }

    mvhd1 = (
        bytes([1]) + b"\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">I", 90000) + struct.pack(">Q", 180000) + b"\x00" * 76
    )
    mp4v1 = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd1) + trak)
    assert decode_media(mp4v1, "video") == {
        "duration_ms": 2000, "n_tracks": 1,
    }

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_media(b"not a video", "video")
