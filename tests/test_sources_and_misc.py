from humid_ray.sources import add_dir, make_file_name, make_file_names


def test_make_file_name():
    # reference tests cover: suffix before first '.', dir prefix
    assert make_file_name("sample.fastq.gz", "/out", "dedup") == "/out/sample_dedup.fastq.gz"
    assert make_file_name("/in/a.parquet", "/out", "annotated") == "/out/a_annotated.parquet"
    assert make_file_name("noext", "/out", "x") == "/out/noext_x"


def test_make_file_names():
    assert make_file_names(["a.pq", "b.pq"], "d", "s") == ["d/a_s.pq", "d/b_s.pq"]


def test_add_dir():
    assert add_dir("f.dat", "/tmp/x") == "/tmp/x/f.dat"
