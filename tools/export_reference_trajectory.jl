# Export a Morbit.jl reference trajectory in the morbit_tpu parity format.
#
# Run where a Julia runtime with Morbit.jl is available (this container has
# none; see morbit_tpu/utils/parity.py for the comparator):
#
#   julia tools/export_reference_trajectory.jl out.json
#
# The config below is BASELINE.json config 1 (two-parabolas 2D, exact
# objectives, unconstrained). Adjust as needed; keep the JSON keys in sync
# with morbit_tpu.utils.parity.

using Morbit
import JSON

f1 = x -> sum((x .- 1) .^ 2)
f2 = x -> sum((x .+ 1) .^ 2)
g1 = x -> 2 .* (x .- 1)
g2 = x -> 2 .* (x .+ 1)

mop = MOP(2)
add_exact_objective!(mop, f1; gradients = g1)
add_exact_objective!(mop, f2; gradients = g2)

x0 = [-3.141592653589793, 2.71828]
x, fx, code, db, iter_data, filt = optimize(mop, x0; max_iter = 20)

doc = Dict(
    "iterates" => [collect(Float64.(it.x)) for it in db.iter_data],
    "delta" => [Float64(it.Δ) for it in db.iter_data],
    "it_stat" => [string(it.it_stat) for it in db.iter_data],
    "n_evals" => Morbit.num_evals(mop),
)

open(ARGS[1], "w") do io
    JSON.print(io, doc)
end
println("wrote ", ARGS[1])
