"""Speaker-embedding cluster plots.

Reference: promonet/plot/speaker/core.py:62 (UMAP projection of WavLM
x-vectors, ground truth vs reconstructed). umap-learn is unavailable
here; the projection uses the in-repo UMAP implementation
(promonet_tpu/plot/umap.py).
"""
import numpy as np

from .umap import UMAP


def from_embeddings(embeddings, labels=None, predicted_embeddings=None):
    """2-D UMAP scatter of speaker embeddings"""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    embeddings = np.asarray(embeddings)
    stacked = embeddings
    if predicted_embeddings is not None:
        stacked = np.concatenate(
            [embeddings, np.asarray(predicted_embeddings)])

    projected = UMAP().fit_transform(stacked)

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
