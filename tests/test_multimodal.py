"""Multimodal plumbing tests: binary columns through actor-pool stages."""

import pyarrow as pa
import pytest
import ray.data

from encode_ingest_ray.stages.multimodal import (
    FakeDecoder,
    FrameSampler,
    RealDecoder,
    decode_pipeline,
    synthesize_media_table,
)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        RealDecoder()


def test_fake_decoder_deterministic_and_schema():
    t = synthesize_media_table(16)
    ds = ray.data.from_arrow(t)
    out = decode_pipeline(ds, concurrency=2, batch_size=4)
    got = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert list(got.columns) == ["media_id", "mime", "width", "height", "features", "content_hash"]
    assert len(got) == 16
    # deterministic: same payload -> same features/hash on a second run
    got2 = decode_pipeline(ray.data.from_arrow(t)).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert got["content_hash"].tolist() == got2["content_hash"].tolist()
    assert all(len(f) == FakeDecoder.THUMB for f in got["features"])


def test_frame_sampler_explodes_rows():
    t = synthesize_media_table(4, payload_bytes=2048)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(FrameSampler, batch_format="pyarrow", batch_size=2, concurrency=2)
    df = out.to_pandas()
    # 2048/256 = 8 frames, every 4th -> 2 frames per media row
    assert len(df) == 8
    assert set(df["media_id"]) == {0, 1, 2, 3}
    assert all(len(f) == 256 for f in df["frame"])
