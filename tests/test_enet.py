"""Elastic-Net solver vs sklearn oracle (the reference's exact estimator)."""

import numpy as np
import pytest
from sklearn.linear_model import ElasticNet, ElasticNetCV
from sklearn.model_selection import ShuffleSplit

from strainscan_tpu.config import IdentifyConfig
from strainscan_tpu.ops import enet

RNG = np.random.default_rng(11)


def _problem(n=400, s=6, noise=0.5):
    X = (RNG.random((n, s)) < 0.3).astype(np.float64)
    w_true = np.abs(RNG.normal(5, 2, size=s))
    w_true[RNG.random(s) < 0.3] = 0
    y = X @ w_true + RNG.normal(0, noise, size=n)
    y = np.maximum(y, 0)
    return X, y


def test_shuffle_split_matches_sklearn():
    n = 101
    masks = enet.shuffle_split_masks(n, 5, 0.5, 0)
    ss = ShuffleSplit(n_splits=5, test_size=0.5, random_state=0)
    for i, (train, test) in enumerate(ss.split(np.zeros((n, 1)))):
        expect = np.zeros(n, dtype=bool)
        expect[test] = True
        assert np.array_equal(masks[i], expect)
        assert np.array_equal(np.where(~masks[i])[0], np.sort(train))


def test_alpha_grid_matches_sklearn():
    from sklearn.linear_model._coordinate_descent import _alpha_grid

    X, y = _problem()
    ours = enet.alpha_grid(X, y, 0.5, 0.001, 50)
    theirs = _alpha_grid(X, y, l1_ratio=0.5, eps=0.001, n_alphas=50,
                         fit_intercept=False)
    assert np.allclose(ours, theirs)


@pytest.mark.parametrize("alpha", [0.001, 0.05, 0.5])
def test_cd_matches_sklearn_enet(alpha):
    X, y = _problem()
    n, s = X.shape
    sk = ElasticNet(alpha=alpha, l1_ratio=0.5, fit_intercept=False,
                    positive=True, max_iter=5000, tol=1e-6, random_state=0,
                    selection="cyclic")
    sk.fit(X, y)
    w = enet._cd_gram(X.T @ X, X.T @ y, n, alpha, 0.5, np.zeros(s),
                      5000, 1e-8, positive=True)
    assert np.allclose(w, sk.coef_, atol=1e-4)


def test_cv_fit_close_to_sklearn():
    X, y = _problem(n=300, s=5)
    cfg = IdentifyConfig(enet_cv_niter=10, enet_nalpha=30)
    res = enet.enet_cv_fit(X, y, cfg)
    cv = ShuffleSplit(n_splits=10, test_size=0.5, random_state=0)
    sk = ElasticNetCV(eps=0.001, alphas=30, fit_intercept=False,
                      max_iter=5000, tol=1e-4, cv=cv, positive=True,
                      random_state=0, selection="cyclic", n_jobs=1)
    sk.fit(X, y)
    assert np.allclose(res.alphas, sk.alphas_)
    # mse paths agree closely -> same mpm alpha in practice
    assert np.allclose(res.mse_path, sk.mse_path_, rtol=0.05, atol=1e-3)
    alpha_sk = enet.lasso_mpm(sk.alphas_, sk.mse_path_)
    assert res.alpha == pytest.approx(alpha_sk, rel=1e-9)
    sk_final = ElasticNet(alpha=res.alpha, l1_ratio=0.5, fit_intercept=False,
                          positive=True, max_iter=5000, tol=1e-4,
                          random_state=0, selection="cyclic")
    sk_final.fit(X, y)
    assert np.allclose(res.coef, sk_final.coef_, atol=1e-3)


def test_cd_path_native_matches_python(monkeypatch):
    """The C alpha-path kernel must agree with the per-fold Python CD it
    replaces (same warm starts, same convergence rule)."""
    from strainscan_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    X, y = _problem(n=2000, s=7)
    alphas = enet.alpha_grid(X, y, 0.5, 1e-3, 50)
    tm = enet.shuffle_split_masks(len(y), 8, 0.5, 0)
    train = ~tm
    grams, moments = enet._fold_grams(X, y, train)
    nt = train.sum(axis=1)
    W_c = enet._cd_path_all_folds(grams, moments, nt, alphas, 0.5,
                                  5000, 1e-4)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    W_py = enet._cd_path_all_folds(grams, moments, nt, alphas, 0.5,
                                   5000, 1e-4)
    np.testing.assert_allclose(W_c, W_py, rtol=1e-9, atol=1e-12)
