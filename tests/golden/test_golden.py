"""Golden end-to-end tests (SURVEY.md §4.3): a frozen FASTA + frozen
outputs, committed after the first verified oracle run. Every backend
must reproduce the golden CSV and BED byte-for-byte — this is the
BASELINE.json bit-identical acceptance criterion in-repo."""

import io
import os

import pytest

from repkiller_tpu import Config, api

HERE = os.path.dirname(os.path.abspath(__file__))
FASTA = os.path.join(HERE, "golden30k.fasta")
CFG = Config(k=12, strands="fr", hit_capacity=1 << 14, max_extend=512,
             extend_mode="banded", band=8)


@pytest.mark.parametrize("backend", ["oracle", "device", "sharded"])
def test_golden_outputs(backend):
    res = api.compare(FASTA, None, CFG, backend=backend)
    buf = io.StringIO()
    res.write_csv(buf)
    want_csv = open(os.path.join(HERE, "golden30k.frags.csv")).read()
    assert buf.getvalue() == want_csv
    buf = io.StringIO()
    res.write_intervals(buf)
    want_bed = open(os.path.join(HERE, "golden30k.repeats.bed")).read()
    assert buf.getvalue() == want_bed


def test_golden_streamed(tmp_path):
    from repkiller_tpu.dist.windows import compare_streamed
    from repkiller_tpu.io import fasta as fio
    from repkiller_tpu.report import csv_writer

    ss = fio.read_fasta(FASTA)
    frag = compare_streamed(ss.codes, None, CFG, out_dir=str(tmp_path),
                            window=8192)
    buf = io.StringIO()
    csv_writer.write_frags_csv(frag, buf, x_name=ss.names[0],
                               x_len=ss.total_length)
    want_csv = open(os.path.join(HERE, "golden30k.frags.csv")).read()
    assert buf.getvalue() == want_csv
