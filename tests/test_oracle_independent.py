"""Engine vs INDEPENDENT oracle: two implementations of the frozen spec,
sharing no kernel code, must agree value-for-value on the synthetic corpus
(all three payload dialects)."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
from amazon_textract_transformer_pipeline_ray.functions.turn import extract_turn
from amazon_textract_transformer_pipeline_ray.oracle_independent import (
    oracle_extract_turn,
)

N_TURNS = 800


@pytest.fixture(scope="module")
def payloads():
    return gen_transcripts(N_TURNS, seed=23).column("text").to_pylist()


def test_independent_oracle_agrees(payloads):
    n_checked = 0
    for payload in payloads:
        got = extract_turn(payload, DEFAULT_CONFIG)
        exp = oracle_extract_turn(payload, DEFAULT_CONFIG)
        if exp is None:
            assert got is None
            continue
        assert got is not None
        n_checked += 1
        assert got.extracted_text == exp["extracted_text"]
        assert got.n_words == exp["n_words"]
        assert len(got.detections) == exp["n_spans"]
        assert abs(got.boilerplate_ratio - exp["boilerplate_ratio"]) < 1e-12
        for gd, ed in zip(got.detections, exp["spans"]):
            assert gd.class_id == ed["class_id"]
            assert gd.class_name == ed["class_name"]
            assert gd.text == ed["text"]
            assert gd.raw_text == ed["raw_text"]
            assert gd.start == ed["start"] and gd.end == ed["end"]
            assert gd.page_num == ed["page"]
            assert (int(gd.box[0]), int(gd.box[1]), int(gd.box[2]),
                    int(gd.box[3])) == (ed["x0"], ed["y0"], ed["x1"], ed["y1"])
            assert abs(gd.confidence - ed["confidence"]) < 1e-9
        assert abs(got.fields.confidence - exp["doc_confidence"]) < 1e-9
        for gf, ef in zip(got.fields.fields, exp["fields"]):
            assert gf.name == ef["name"]
            assert gf.num_detections == ef["num_detections"]
            assert gf.num_detected_values == ef["num_detected_values"]
            assert gf.value == ef["value"]
            assert abs(gf.confidence - ef["confidence"]) < 1e-9
            assert [v[0] for v in gf.values] == [v[0] for v in ef["values"]]
            got_vc = np.array([v[1] for v in gf.values])
            exp_vc = np.array([v[1] for v in ef["values"]])
            assert np.allclose(got_vc, exp_vc, atol=1e-9)
    assert n_checked > N_TURNS // 2  # the corpus is mostly non-empty turns
