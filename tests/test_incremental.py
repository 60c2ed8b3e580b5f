"""Incremental curation pipeline (VERDICT r3 #6): end-to-end chain
correctness plus resume-after-kill semantics of the partitioned output."""

import os
import shutil
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    import ray.data

    return ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def _canon(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_chain_matches_sequential(ray_session, tmp_path):
    """Distributed chain == a sequential pandas re-derivation of the spec
    (dedup vs even-gen, cross-generation near-dup drop, C4 gate, min-id
    canonical).  The near-dup drop set re-derives from the confirmed-pair
    op (minhash_dedup — its pair spec carries its own golden elsewhere),
    so this test pins the COMPOSITION, not the pair algorithm."""
    import re

    from collections import Counter

    import pyarrow.parquet as pq

    from spider_ray.ops.dedup import minhash_dedup
    from spider_ray.pipelines.incremental import incremental_curation

    out = str(tmp_path / "inc")
    got = _canon(incremental_curation(_docs(), out))

    # threshold 0.5 = cross_generation_drop_ids' default (the 0.8
    # minhash_dedup default is a DIFFERENT pair spec — a cross pair in
    # the [0.5, 0.8) band would make this re-derivation wrong)
    pairs = minhash_dedup(_docs(), threshold=0.5).to_pandas()
    ndrops = set(
        pairs.loc[(pairs.doc_b % 2 == 1) & (pairs.doc_a % 2 == 0), "doc_b"]
    ) | set(
        pairs.loc[(pairs.doc_a % 2 == 1) & (pairs.doc_b % 2 == 0), "doc_a"]
    )

    tok = re.compile(r"\S+")
    df = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet")
    ).to_pandas()
    ref_texts = {(t or "") for t in df[df.doc_id % 2 == 0].text}
    fresh = df[df.doc_id % 2 == 1]
    rows = []
    for _, r in fresh.iterrows():
        t = r.text or ""
        if t in ref_texts or int(r.doc_id) in ndrops:
            continue
        c = Counter(w.lower() for w in tok.findall(t))
        nw, nd = sum(c.values()), len(c)
        mx = max(c.values()) if c else 0
        if not (10 <= nw <= 100000 and 2 * nd >= nw and 8 * mx <= nw):
            continue
        rows.append((int(r.doc_id), r.source, t, len(tok.findall(t))))
    first_by_text = {}
    for doc_id, source, t, n in sorted(rows):
        first_by_text.setdefault(t, (doc_id, source, n))
    want = pd.DataFrame(
        sorted(first_by_text.values()),
        columns=["doc_id", "source", "n_tokens"],
    )
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    assert len(got) and len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_resume_after_kill(ray_session, tmp_path):
    """A killed run leaves some partitions landed, some missing, and one
    orphaned .tmp from a writer killed mid-write; the re-run must rewrite
    ONLY the missing partitions (atomic, skip_existing) and read back the
    identical curated set."""
    from spider_ray.pipelines.incremental import incremental_curation

    out = str(tmp_path / "inc")
    first = _canon(incremental_curation(_docs(), out))
    parts = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert len(parts) >= 3

    # simulate the kill: two partitions never landed, one writer died
    # mid-write leaving a stale tmp next to its (complete) final file
    for d in parts[:2]:
        shutil.rmtree(os.path.join(out, d))
    victim = os.path.join(out, parts[2])
    with open(os.path.join(victim, "part.parquet.tmp.12345"), "wb") as f:
        f.write(b"garbage from a killed writer")
    mtime_before = os.path.getmtime(os.path.join(victim, "part.parquet"))

    second = _canon(incremental_curation(_docs(), out))
    pd.testing.assert_frame_equal(second, first, check_dtype=False,
                                  check_exact=True)
    # landed partition untouched (resume skipped it)
    assert os.path.getmtime(os.path.join(victim, "part.parquet")) == mtime_before
    # deleted partitions rewritten
    for d in parts[:2]:
        assert os.path.exists(os.path.join(out, d, "part.parquet"))


def test_completed_manifest_resume(ray_session, tmp_path):
    """The location-independent resume path: completed= keys are honored
    even when skip_existing can't see the files (driver-held manifest)."""
    from spider_ray.pipelines.incremental import incremental_curation

    out = str(tmp_path / "inc")
    first = _canon(incremental_curation(_docs(), out))
    parts = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("source=")
    )
    done = frozenset(parts[:2])
    for p in parts[:2]:
        shutil.rmtree(os.path.join(out, f"source={p}"))
    # completed says those partitions already landed elsewhere -> the
    # re-run must NOT rewrite them, so the read-back misses exactly them
    partial = _canon(incremental_curation(_docs(), out, completed=done))
    missing = set(first.source.unique()) - set(partial.source.unique())
    assert missing == done
    kept = first[~first.source.isin(done)].reset_index(drop=True)
    pd.testing.assert_frame_equal(partial, _canon_df(kept), check_dtype=False,
                                  check_exact=True)


def _canon_df(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)
