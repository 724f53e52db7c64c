from .stats import (  # noqa: F401
    column_stats, grouped_column_stats, heavy_hitters,
    stats_bounds_violations, stats_drift_violations, stats_snapshot,
)
from .uniqueness import duplicate_keys, unique_violations  # noqa: F401
from .referential import ref_violations  # noqa: F401
from .drift import (  # noqa: F401
    chi2_distance, drift_by_group_violations, drift_violations,
    grouped_histograms, histogram, histogram_counts,
    js_divergence, ks_stat, load_snapshot, psi, save_snapshot, snapshot,
)
from .rollup import salted_rollup  # noqa: F401
from .schema import schema_violations  # noqa: F401
from .embedding import (  # noqa: F401
    embedding_dim, embedding_drift_violations, embedding_snapshot,
)
from .metrics import (  # noqa: F401
    column_entropy, correlation, correlation_violations,
    entropy_violations, grouped_column_entropy,
    grouped_entropy_violations, mutual_information,
    mutual_information_violations,
)
from .outliers import (  # noqa: F401
    iqr_fences, iqr_outlier_violations, mad_outlier_violations, mad_params,
)
from .suggest import build_ruleset, suggest_rules  # noqa: F401
from .integrity import (  # noqa: F401
    calendar_gap_violations, freshness_violations,
    functional_dependency_violations, group_size_violations,
    monotonic_violations, reconciliation_violations, volume_anomalies,
)
