from .corpus import read_corpus, read_fasta, iter_files
