from clover_tpu.evaluation.metrics import (  # noqa: F401
    l2_normalize,
    mean_average_precision,
    mean_class_accuracy,
    precision_recall_at_threshold,
    multiple_choice_retrieval_acc,
    qa_accuracy,
    retrieval_recall,
    retrieval_recall_varied,
    top_k_accuracy,
    zeroshot_action_recognition_acc,
)
