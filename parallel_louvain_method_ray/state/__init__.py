from parallel_louvain_method_ray.state.shard_pool import ShardPool

__all__ = ["ShardPool"]
