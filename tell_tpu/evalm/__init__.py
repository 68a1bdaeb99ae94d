from .bleu import bleu_scores, sentence_bleu
from .rouge import rouge_l
from .cider import CiderScorer
from .entities import entity_precision_recall
