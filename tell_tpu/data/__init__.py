from .tokenizer import ByteBPE, RobertaTokenizer
