from .ball_query import knn_point, query_ball_point, select_top_k  # noqa: F401
from .fps import (farthest_point_sample, farthest_point_sample_pallas,  # noqa: F401
                  gather_point, prob_sample)
from .grouping import group_point  # noqa: F401
from .interpolate import three_interpolate, three_nn  # noqa: F401
