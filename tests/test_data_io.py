"""Top-level anndata-style readers (parity: reference spateo/data_io.py)."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


@pytest.fixture
def table(tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        rng.poisson(2, (6, 4)).astype(float),
        index=[f"c{i}" for i in range(6)],
        columns=[f"g{j}" for j in range(4)],
    )
    return df, tmp_path


class TestDataIO:
    def test_top_level_surface(self):
        for name in ("read", "read_csv", "read_excel", "read_h5ad", "read_hdf",
                     "read_loom", "read_mtx", "read_text", "read_umi_tools", "read_zarr"):
            assert callable(getattr(st, name)), name
        assert isinstance(st.__version__, str) and st.__version__
        assert callable(st.get_version)
        assert st.LazyAttribute is not None

    def test_read_csv(self, table):
        df, tmp = table
        p = tmp / "t.csv"
        df.to_csv(p)
        a = st.read_csv(p)
        assert a.shape == (6, 4)
        assert list(a.obs_names) == list(df.index)
        assert list(a.var_names) == list(df.columns)
        np.testing.assert_allclose(np.asarray(a.X), df.values)

    def test_read_text(self, table):
        df, tmp = table
        p = tmp / "t.tsv"
        df.to_csv(p, sep="\t")
        a = st.read_text(p, delimiter="\t")
        assert a.shape == (6, 4)

    def test_read_mtx(self, table):
        from scipy.io import mmwrite
        from scipy.sparse import csr_matrix

        df, tmp = table
        p = tmp / "t.mtx"
        mmwrite(str(p), csr_matrix(df.values))
        a = st.read_mtx(p)
        assert a.shape == (6, 4)
        np.testing.assert_allclose(np.asarray(a.X.toarray() if hasattr(a.X, "toarray") else a.X), df.values)

    def test_read_umi_tools(self, table):
        df, tmp = table
        p = tmp / "umi.tsv"
        rows = ["gene\tcell\tcount"]
        for g in ("G1", "G2"):
            for c in ("A", "B", "C"):
                rows.append(f"{g}\t{c}\t3")
        p.write_text("\n".join(rows) + "\n")
        a = st.read_umi_tools(p)
        assert a.shape == (3, 2)
        assert sorted(a.var_names) == ["G1", "G2"]

    def test_read_hdf_and_loom(self, table):
        import h5py

        df, tmp = table
        ph = tmp / "t.h5"
        with h5py.File(ph, "w") as f:
            f.create_dataset("X", data=df.values)
        a = st.read_hdf(ph, "X")
        assert a.shape == (6, 4)
        with pytest.raises(KeyError):
            st.read_hdf(ph, "missing")

        pl = tmp / "t.loom"
        with h5py.File(pl, "w") as f:
            f.create_dataset("matrix", data=df.values.T)  # loom: genes x cells
            f.create_group("col_attrs").create_dataset(
                "CellID", data=np.array([s.encode() for s in df.index])
            )
            f.create_group("row_attrs").create_dataset(
                "Gene", data=np.array([s.encode() for s in df.columns])
            )
        a2 = st.read_loom(pl)
        assert a2.shape == (6, 4)
        assert list(a2.obs_names) == list(df.index)

    def test_read_roundtrip_h5ad(self, table, tmp_path):
        df, _ = table
        a = st.AnnData(X=df.values, obs=pd.DataFrame(index=df.index), var=pd.DataFrame(index=df.columns))
        p = tmp_path / "t.h5ad"
        a.write(str(p))
        b = st.read(p)
        assert b.shape == a.shape
        np.testing.assert_allclose(np.asarray(b.X), df.values)
