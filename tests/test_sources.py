import ray.data

from osf_data_validator_tool_ray.sources.io import partition_files, read_table
from osf_data_validator_tool_ray.synth import write_clips_dataset


def test_read_table_and_partitions(tmp_path):
    meta = write_clips_dataset(str(tmp_path), n_rows=60, seed=5,
                               defect_rate=0.0, num_shards=3)
    files = partition_files(meta["clips_dir"])
    assert len(files) == 3
    ds = read_table(meta["clips_dir"], columns=["clip_id", "codec"])
    assert ds.count() == 60
    assert set(ds.schema().names) == {"clip_id", "codec"}
    ds2 = read_table(meta["clips_dir"] + "/*.parquet")
    assert ds2.count() == 60
