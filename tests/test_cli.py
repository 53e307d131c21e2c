"""End-to-end CLI test: synthetic BAM + GTF -> `velocyto run` -> loom."""
import os

import numpy as np
import pytest
from click.testing import CliRunner

from velocyto_tpu.counting import bamio
from velocyto_tpu.io import loom as loomio


def _gtf_line(chrom, start, end, strand, trid, gene, exno):
    tags = (f'gene_id "{gene}"; transcript_id "{trid}"; '
            f'gene_name "{gene}_n"; transcript_name "{trid}_n"; '
            f'exon_number "{exno}";')
    return f"{chrom}\ttest\texon\t{start}\t{end}\t.\t{strand}\t.\t{tags}\n"


@pytest.fixture
def synthetic_sample(tmp_path):
    gtf = tmp_path / "ann.gtf"
    gtf.write_text("".join([
        _gtf_line("1", 1000, 1200, "+", "A1", "GA", 1),
        _gtf_line("1", 2000, 2200, "+", "A1", "GA", 2),
        _gtf_line("1", 3000, 3200, "+", "A1", "GA", 3),
        _gtf_line("1", 1000, 1200, "+", "A2", "GA", 1),
        _gtf_line("1", 3000, 3200, "+", "A2", "GA", 2),
        # a second gene downstream so GA features are not last in the index
        _gtf_line("1", 90000, 90500, "+", "Z1", "GZ", 1),
        _gtf_line("1", 91000, 91200, "+", "Z1", "GZ", 2),
    ]))

    cells = [f"BC{i:02d}" for i in range(4)]
    recs = []
    rid = 0
    rng = np.random.RandomState(0)
    for ci, bc in enumerate(cells):
        # many exonic molecules (to pass the 80-molecule cutoff use bcfile)
        for m in range(30):
            umi = f"U{m:04d}"
            pos0 = 1000 + rng.randint(0, 100)   # 0-based: inside exon1
            recs.append(bamio.BamRecord(
                f"r{rid}", 0, 0, pos0, [(0, 98)],
                {"CB": bc + "-1", "UB": umi, "NH": 1}, seq="A" * 98))
            rid += 1
        # intronic molecules
        for m in range(10):
            umi = f"V{m:04d}"
            pos0 = 1300 + rng.randint(0, 500)
            recs.append(bamio.BamRecord(
                f"r{rid}", 0, 0, pos0, [(0, 80)],
                {"CB": bc + "-1", "UB": umi, "NH": 1}, seq="A" * 80))
            rid += 1
        # one exon-intron spanning molecule (validates the intron)
        recs.append(bamio.BamRecord(
            f"r{rid}", 0, 0, 1149, [(0, 100)],
            {"CB": bc + "-1", "UB": "SPAN", "NH": 1}, seq="A" * 100))
        rid += 1
    bam = tmp_path / "sample.bam"
    bamio.write_bam(str(bam), [("chr1", 200000)], recs)

    bcfile = tmp_path / "barcodes.tsv"
    bcfile.write_text("\n".join(f"{c}-1" for c in cells))
    return str(bam), str(gtf.resolve()), str(bcfile), cells


def test_velocyto_run_cli(synthetic_sample, tmp_path):
    from velocyto_tpu.commands.run import run
    bam, gtf, bcfile, cells = synthetic_sample
    out = tmp_path / "out"
    runner = CliRunner()
    result = runner.invoke(run, [bam, gtf, "-b", bcfile, "-o", str(out),
                                 "-e", "testsample", "-vvv"],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    loom_path = out / "testsample.loom"
    assert loom_path.exists()
    ds = loomio.connect(str(loom_path))
    S = ds.layer["spliced"][:, :]
    U = ds.layer["unspliced"][:, :]
    ra = ds.row_attrs
    ca = ds.col_attrs
    ds.close()
    assert S.shape[0] == 2  # GA + GZ
    assert S.shape[1] == 4  # four whitelisted cells
    ga = list(ra["Accession"]).index("GA")
    # 30 exonic molecules per cell
    np.testing.assert_array_equal(np.sort(S[ga]), [30, 30, 30, 30])
    # 10 intronic + 1 spanning molecule -> 11 unspliced each (Permissive)
    np.testing.assert_array_equal(np.sort(U[ga]), [11, 11, 11, 11])
    assert all(cid.startswith("testsample:BC") for cid in ca["CellID"])
    assert ra["Gene"][ga] == "GA_n"


def test_velocyto_cli_group_help():
    from velocyto_tpu.commands.velocyto import cli
    runner = CliRunner()
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    for sub in ("run", "run10x", "run-dropest", "run-smartseq2", "tools"):
        assert sub in result.output


def test_run_smartseq2_cli(tmp_path):
    """One-bam-per-cell UMI-less counting through the CLI."""
    gtf = tmp_path / "ann.gtf"
    gtf.write_text("".join([
        _gtf_line("1", 1000, 1200, "+", "A1", "GA", 1),
        _gtf_line("1", 2000, 2200, "+", "A1", "GA", 2),
        _gtf_line("1", 90000, 90200, "+", "Z1", "GZ", 1),
        _gtf_line("1", 91000, 91200, "+", "Z1", "GZ", 2),
    ]))
    bams = []
    for cell in ("w1", "w2"):
        recs = []
        for m in range(90):   # UMI-less: every read is one molecule
            recs.append(bamio.BamRecord(
                f"{cell}r{m}", 0, 0, 1020 + m, [(0, 90)], {"NH": 1},
                seq="A" * 90))
        p = tmp_path / f"{cell}.bam"
        bamio.write_bam(str(p), [("chr1", 200000)], recs)
        bams.append(str(p))
    from velocyto_tpu.commands.run_smartseq2 import run_smartseq2
    out = tmp_path / "out"
    runner = CliRunner()
    result = runner.invoke(run_smartseq2,
                           bams + [str(gtf), "-o", str(out), "-e", "plate1"],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    ds = loomio.connect(str(out / "plate1.loom"))
    S = ds.layer["spliced"][:, :]
    assert "spanning" in ds.layer.keys()
    ca = ds.col_attrs
    ds.close()
    assert S.shape[1] == 2
    # every exonic read counts (UMI-less placeholder umis are unique whp)
    assert S.sum() == 180


def test_run10x_cli(synthetic_sample, tmp_path):
    """Fake cellranger sample folder layout end-to-end."""
    import gzip
    import os
    import numpy as np
    from velocyto_tpu.io import loom as loomio

    bam, gtf, bcfile, cells = synthetic_sample
    sample = tmp_path / "SAMPLE10X"
    outs = sample / "outs"
    (outs / "filtered_feature_bc_matrix").mkdir(parents=True)
    (sample / "_log").write_text("...\nPipestance completed successfully!\n")
    import shutil
    shutil.copy(bam, outs / "possorted_genome_bam.bam")
    with gzip.open(outs / "filtered_feature_bc_matrix" / "barcodes.tsv.gz",
                   "wt") as f:
        f.write(open(bcfile).read())
    # cellranger analysis extras: tsne + graphclust
    tsne_dir = outs / "analysis" / "tsne" / "2_components"
    tsne_dir.mkdir(parents=True)
    n = len(cells)
    with open(tsne_dir / "projection.csv", "w") as f:
        f.write("Barcode,TSNE-1,TSNE-2\n")
        for i, c in enumerate(cells):
            f.write(f"{c}-1,{i * 1.0},{-i * 2.0}\n")
    cl_dir = outs / "analysis" / "clustering" / "graphclust"
    cl_dir.mkdir(parents=True)
    with open(cl_dir / "clusters.csv", "w") as f:
        f.write("Barcode,Cluster\n")
        for i, c in enumerate(cells):
            f.write(f"{c}-1,{1 + i % 2}\n")

    from click.testing import CliRunner
    from velocyto_tpu.commands.run10x import run10x
    res = CliRunner().invoke(run10x, [str(sample), gtf, "-@", "1"],
                             catch_exceptions=False)
    assert res.exit_code == 0, res.output
    out_loom = sample / "velocyto" / "SAMPLE10X.loom"
    assert out_loom.exists()
    c = loomio.connect(str(out_loom))
    assert len(c.ca["CellID"]) == len(cells)
    assert "_X" in c.ca and "_Y" in c.ca and "Clusters" in c.ca
    assert c.layers["spliced"][:, :].sum() > 0


def test_custom_logic_reflection(synthetic_sample, tmp_path, monkeypatch):
    """Reference extension point: a user Logic subclass resolvable by
    name from the package namespace (reference _run.py:86-91)."""
    import velocyto_tpu as vt
    from velocyto_tpu.counting.logics import Permissive10X

    class MyLogic(Permissive10X):
        name = "MyLogic"

    monkeypatch.setattr(vt, "MyLogic", MyLogic, raising=False)
    bam, gtf, bcfile, cells = synthetic_sample
    from click.testing import CliRunner
    from velocyto_tpu.commands.run import run
    out = tmp_path / "outcustom"
    res = CliRunner().invoke(
        run, ["-b", bcfile, "-o", str(out), "-e", "CUST", "-l", "MyLogic",
              "-@", "1", bam, gtf], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert (out / "CUST.loom").exists()


def test_run_dropest_cli(synthetic_sample, tmp_path):
    """DropEst wrapper: barcode auto-discovery + forced chr umi extension."""
    import shutil
    from velocyto_tpu.io import loom as loomio
    bam, gtf, bcfile, cells = synthetic_sample
    work = tmp_path / "dropest"
    work.mkdir()
    dbam = work / "SAMPLEA_tagged.bam"
    shutil.copy(bam, dbam)
    # auto-discovered whitelist: barcodes_<prefix>.tsv next to the bam
    (work / "barcodes_SAMPLEA.tsv").write_text(
        "\n".join(f"{c}-1" for c in cells))
    from click.testing import CliRunner
    from velocyto_tpu.commands.run_dropest import run_dropest
    out = tmp_path / "outdropest"
    res = CliRunner().invoke(run_dropest,
                             ["-o", str(out), "-@", "1", str(dbam), gtf],
                             catch_exceptions=False)
    assert res.exit_code == 0, res.output
    looms = list(out.glob("*.loom"))
    assert len(looms) == 1
    c = loomio.connect(str(looms[0]))
    assert len(c.ca["CellID"]) == len(cells)
    assert c.layers["spliced"][:, :].sum() > 0
