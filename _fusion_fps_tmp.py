import bench
print("fusion_fps:", bench.bench_fusion())
