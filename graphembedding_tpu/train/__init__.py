from graphembedding_tpu.train.skipgram import SkipGramConfig, SkipGramTrainer

__all__ = ["SkipGramConfig", "SkipGramTrainer"]
