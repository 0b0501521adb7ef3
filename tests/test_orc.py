"""ORC source conformance (SURVEY.md §2.1 R4)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from fileconvert_ray.sources.csvio import CsvOptions
from fileconvert_ray.sources.orcio import orc_stripes, orc_to_parquet, read_orc_dataset, write_orc


def _fixture(sf_dir, tmp_path):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    t = t.set_column(0, "doc_id", pc.cast(t.column("doc_id"), pa.string()))
    path = str(tmp_path / "docs.orc")
    write_orc(t, path)
    return t, path


def test_orc_read_lossless(ray_session, sf_dir, tmp_path):
    t, path = _fixture(sf_dir, tmp_path)
    assert len(orc_stripes(path)) >= 1
    got = pa.Table.from_pandas(
        read_orc_dataset(path, CsvOptions(sanitize=False)).to_pandas(), preserve_index=False
    )
    a = t.sort_by("doc_id").combine_chunks()
    b = got.select(t.column_names).cast(t.schema).sort_by("doc_id").combine_chunks()
    assert a.equals(b)


def test_orc_to_parquet(ray_session, sf_dir, tmp_path):
    t, path = _fixture(sf_dir, tmp_path)
    out = str(tmp_path / "pq_out")
    orc_to_parquet(path, out, CsvOptions(sanitize=False))
    files = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
    back = pa.concat_tables([pq.read_table(f) for f in files])
    assert back.num_rows == t.num_rows
    assert sorted(back.column_names) == sorted(t.column_names)
