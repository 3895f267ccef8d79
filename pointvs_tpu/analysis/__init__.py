"""Metrics and pose-ranking analysis (ref: point_vs/analysis/*)."""
from pointvs_tpu.analysis.top_n import top_n
from pointvs_tpu.analysis.ranking import Ranking
