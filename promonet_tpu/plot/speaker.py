"""Speaker-embedding cluster plots.

Reference: promonet/plot/speaker/core.py (UMAP projection of WavLM
x-vectors, ground truth vs reconstructed). umap-learn is unavailable
here; PCA to 2-D provides the same visualization contract.
"""
import numpy as np


def from_embeddings(embeddings, labels=None, predicted_embeddings=None):
    """2-D projection scatter of speaker embeddings"""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    embeddings = np.asarray(embeddings)
    stacked = embeddings
    if predicted_embeddings is not None:
        stacked = np.concatenate(
            [embeddings, np.asarray(predicted_embeddings)])

    # PCA projection
    centered = stacked - stacked.mean(axis=0)
    _, _, components = np.linalg.svd(centered, full_matrices=False)
    projected = centered @ components[:2].T

    figure, axis = plt.subplots(figsize=(6, 6))
    n = len(embeddings)
    axis.scatter(
        projected[:n, 0], projected[:n, 1],
        c=labels if labels is not None else None,
        marker='o', label='ground truth', alpha=.7)
    if predicted_embeddings is not None:
        axis.scatter(
            projected[n:, 0], projected[n:, 1],
            c=labels if labels is not None else None,
            marker='x', label='reconstructed', alpha=.7)
    axis.legend()
    axis.set_title('Speaker embeddings')
    return figure
