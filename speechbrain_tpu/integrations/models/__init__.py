"""Model integrations: score-based generative enhancement (SGMSE+)."""
