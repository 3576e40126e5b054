"""PCA parity vs sklearn on the real fixture."""

import numpy as np
import pytest

from bayesian_inference_tpu import io
from bayesian_inference_tpu.models import pca as pca_mod


@pytest.fixture(scope="module")
def Y(test_data_dir=None):
    from pathlib import Path

    d = Path(__file__).parent / "test_data"
    return io.predictions_matrix_from_h5(str(d), filename="observables.h5")


def test_pca_matches_sklearn(Y):
    import sklearn.decomposition as skd
    import sklearn.preprocessing as skp

    scaler = skp.StandardScaler()
    sk_pca = skd.PCA(svd_solver="full", whiten=False)
    Y_pca_ref = sk_pca.fit_transform(scaler.fit_transform(Y))

    state, Y_pca = pca_mod.fit_pca(Y)

    np.testing.assert_allclose(np.asarray(state.mean), scaler.mean_, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(state.scale), scaler.scale_, rtol=1e-10)
    # Centering makes the data rank n_samples-1: the final component spans the
    # numerical null space and is arbitrary (sv ~ 1e-14), so compare only the
    # numerically determined components.
    rank = int(np.sum(sk_pca.singular_values_ > 1e-8))
    assert rank == Y.shape[0] - 1
    np.testing.assert_allclose(
        np.asarray(state.components)[:rank], sk_pca.components_[:rank], rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(state.explained_variance)[:rank], sk_pca.explained_variance_[:rank], rtol=1e-8
    )
    np.testing.assert_allclose(np.asarray(Y_pca)[:, :rank], Y_pca_ref[:, :rank], rtol=0, atol=1e-7)


def test_pca_truncated_reconstruction_matches_sklearn(Y):
    import sklearn.decomposition as skd
    import sklearn.preprocessing as skp

    n_pc = 5
    scaler = skp.StandardScaler()
    sk_pca = skd.PCA(svd_solver="full", whiten=False)
    Y_pca_ref = sk_pca.fit_transform(scaler.fit_transform(Y))
    ref = scaler.inverse_transform(Y_pca_ref[:, :n_pc].dot(sk_pca.components_[:n_pc, :]))

    state, Y_pca = pca_mod.fit_pca(Y)
    ours = np.asarray(state.inverse_transform(Y_pca[:, :n_pc]))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-8)

    # transform() of the original data reproduces the fit scores
    np.testing.assert_allclose(np.asarray(state.transform(Y, n_pc=n_pc)), np.asarray(Y_pca[:, :n_pc]), atol=1e-8)


def test_max_n_components_cap(Y):
    state, Y_pca = pca_mod.fit_pca(Y, max_n_components=7)
    assert state.n_components == 7
    assert Y_pca.shape == (Y.shape[0], 7)


def test_truncation_covariance_psd_and_decomposition(Y):
    state, _ = pca_mod.fit_pca(Y)
    n_pc = 5
    sigma = np.asarray(pca_mod.truncation_covariance(state, n_pc))
    # symmetric PSD
    np.testing.assert_allclose(sigma, sigma.T, atol=1e-10)
    eigs = np.linalg.eigvalsh(sigma)
    assert eigs.min() > -1e-8
    # explained + unexplained = full covariance of scaled data (up to 1/(n-1))
    S = np.asarray(state.components).T
    D2 = np.asarray(state.explained_variance)
    full = (S * D2) @ S.T
    kept = (S[:, :n_pc] * D2[:n_pc]) @ S[:, :n_pc].T
    np.testing.assert_allclose(kept + sigma, full, atol=1e-8)
