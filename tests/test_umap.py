"""In-repo UMAP: cluster-preservation tests (plot/umap.py)."""
import numpy as np

from promonet_tpu.plot.umap import UMAP
from promonet_tpu.plot import speaker


def make_clusters(rng, clusters=4, per=20, dim=32, separation=8.):
    centers = rng.normal(0, separation, (clusters, dim))
    points = np.concatenate([
        center + rng.normal(0, 1., (per, dim)) for center in centers])
    labels = np.repeat(np.arange(clusters), per)
    return points, labels


def test_umap_preserves_clusters():
    rng = np.random.default_rng(0)
    points, labels = make_clusters(rng)
    projected = UMAP(n_epochs=150, random_state=0).fit_transform(points)
    assert projected.shape == (len(points), 2)
    assert np.isfinite(projected).all()

    # Mean distance to own-cluster centroid << to other centroids
    centroids = np.stack([
        projected[labels == c].mean(axis=0) for c in range(4)])
    own = np.linalg.norm(
        projected - centroids[labels], axis=1).mean()
    distances = np.linalg.norm(
        projected[:, None, :] - centroids[None, :, :], axis=2)
    distances[np.arange(len(labels)), labels] = np.inf
    other = distances.min(axis=1).mean()
    assert other > 2. * own

    # 1-NN classification in the projection recovers the clustering
    deltas = np.linalg.norm(
        projected[:, None, :] - projected[None, :, :], axis=2)
    np.fill_diagonal(deltas, np.inf)
    nearest = labels[np.argmin(deltas, axis=1)]
    assert (nearest == labels).mean() > 0.9


def test_umap_deterministic():
    rng = np.random.default_rng(1)
    points, _ = make_clusters(rng, clusters=2, per=10)
    first = UMAP(n_epochs=50, random_state=7).fit_transform(points)
    second = UMAP(n_epochs=50, random_state=7).fit_transform(points)
    assert np.allclose(first, second)


def test_umap_tiny_input_fallback():
    points = np.random.default_rng(2).normal(0, 1, (3, 8))
    projected = UMAP().fit_transform(points)
    assert projected.shape == (3, 2)


def test_speaker_plot_runs():
    rng = np.random.default_rng(3)
    points, labels = make_clusters(rng, clusters=3, per=8, dim=16)
    figure = speaker.from_embeddings(
        points, labels=labels, predicted_embeddings=points + 0.1)
    assert figure is not None
