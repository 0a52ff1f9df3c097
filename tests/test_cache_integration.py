"""The whole-result LRU through the real Ray pipeline: a duplicate-
heavy corpus extracts byte-identically with the cache on and off."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_pipeline_identical_with_and_without_cache(ray_session, tmp_path):
    from pdfrust_ray.pipelines.extract_pipeline import build_extraction
    from pdfrust_ray.sources.transcripts import read_transcripts

    pdf = open("/root/reference/data/helloworld.pdf", "rb").read().decode("latin-1")
    rows = []
    for c in range(40):
        for i in range(5):
            # every conversation re-quotes the same pdf + one unique turn
            rows.append((f"c{c:03d}", i, pdf if i % 2 == 0 else f"turn {c}/{i}"))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))], pa.timestamp("us")),
        }
    )
    d = tmp_path / "corpus" / "shards"
    d.mkdir(parents=True)
    pq.write_table(t, d / "part-0000.parquet")

    base = build_extraction(
        read_transcripts(str(tmp_path / "corpus")), mode="text", concurrency=2
    ).to_pandas()
    assert len(base) == len(rows)
    # cached pdf turns all extracted identically (same bytes -> same result)
    pdf_rows = base[base["payload_kind"] == "pdf"]
    assert pdf_rows["extracted_text"].nunique() == 1
    assert (pdf_rows["parse_status"] == "ok").all()
