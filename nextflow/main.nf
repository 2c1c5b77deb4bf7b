// Pipeline layer for the TPU-native CoGAPS — the analog of the
// reference's nextflow processes (reference: nextflow/main.nf:1-177:
// COGAPS + 10x/AnnData -> dgCMatrix conversions). The engine here reads
// 10x h5 / AnnData h5ad natively (cogaps_tpu/io/h5.py), so the
// conversion processes standardize inputs to a COO .npz bundle instead
// of an R dgCMatrix.
//
// Expected cparams map keys (mirroring the reference's parameter
// matrix, main.nf:38-48): niterations, npatterns, sparse, distributed
// (null | "genome-wide" | "single-cell"), nsets.

process COGAPS {
  tag "$prefix"
  label 'process_medium'
  label 'process_long'
  container 'ghcr.io/cogaps-tpu/cogaps-tpu:latest'

  input:
    tuple val(meta), path(matrix), val(cparams)

  output:
    tuple val(meta), path("${prefix}/result.npz"), emit: cogapsResult
    path  "versions.yml",                          emit: versions

  stub:
  prefix = task.ext.prefix ?: "${meta.id}/${cparams.niterations}-${cparams.npatterns}-${cparams.sparse}-${cparams.distributed}"
  """
  mkdir -p "${prefix}"
  touch "${prefix}/result.npz"
  cat <<-END_VERSIONS > versions.yml
    "${task.process}":
        cogaps_tpu: \$(python -c 'import cogaps_tpu; print(cogaps_tpu.__version__)')
  END_VERSIONS
  """

  script:
  prefix = task.ext.prefix ?: "${meta.id}/${cparams.niterations}-${cparams.npatterns}-${cparams.sparse}-${cparams.distributed}"
  def sparse_flag = cparams.sparse ? "--sparse" : ""
  def dist_flag = (cparams.distributed && cparams.distributed != "null") \
      ? "--distributed ${cparams.distributed} --n-sets ${cparams.nsets}" : ""
  """
  mkdir -p "${prefix}"
  python -m cogaps_tpu "$matrix" \\
      --n-patterns ${cparams.npatterns} \\
      --n-iterations ${cparams.niterations} \\
      --seed 42 \\
      --output-frequency \$(( ${cparams.niterations} / 10 )) \\
      ${sparse_flag} ${dist_flag} \\
      -o "${prefix}/result"

  cat <<-END_VERSIONS > versions.yml
    "${task.process}":
        cogaps_tpu: \$(python -c 'import cogaps_tpu; print(cogaps_tpu.__version__)')
  END_VERSIONS
  """
}

// 10x Genomics h5 -> COO npz (reference: COGAPS_TENX2DGC,
// nextflow/main.nf:62-103). The engine also reads 10x h5 directly;
// this process exists for workflows that want an explicit, cached
// conversion step.
process COGAPS_TENX2NPZ {
  tag "$meta.id"
  label 'process_low'
  container 'ghcr.io/cogaps-tpu/cogaps-tpu:latest'

  input:
    tuple val(meta), path(tenx_h5)

  output:
    tuple val(meta), path("${meta.id}.coo.npz"), emit: matrix
    path "versions.yml",                         emit: versions

  script:
  """
  python - <<'PYEOF'
  from cogaps_tpu.io.h5 import read_10x_h5
  import numpy as np
  coo, genes, barcodes = read_10x_h5("${tenx_h5}")
  np.savez("${meta.id}.coo.npz", rows=coo.rows, cols=coo.cols,
           vals=coo.vals, shape=np.asarray(coo.shape),
           row_names=np.asarray(genes or [], dtype=object),
           col_names=np.asarray(barcodes or [], dtype=object))
  PYEOF
  cat <<-END_VERSIONS > versions.yml
    "${task.process}":
        cogaps_tpu: \$(python -c 'import cogaps_tpu; print(cogaps_tpu.__version__)')
  END_VERSIONS
  """
}

// AnnData h5ad -> COO npz (reference: COGAPS_ADATA2DGC,
// nextflow/main.nf:105-177).
process COGAPS_ADATA2NPZ {
  tag "$meta.id"
  label 'process_low'
  container 'ghcr.io/cogaps-tpu/cogaps-tpu:latest'

  input:
    tuple val(meta), path(h5ad)

  output:
    tuple val(meta), path("${meta.id}.coo.npz"), emit: matrix
    path "versions.yml",                         emit: versions

  script:
  """
  python - <<'PYEOF'
  from cogaps_tpu.io.h5 import read_h5ad
  from cogaps_tpu.io.h5 import CooMatrix
  import numpy as np
  mat, genes, cells = read_h5ad("${h5ad}")
  if not isinstance(mat, CooMatrix):
      dense = np.asarray(mat, np.float32)
      r, c = np.nonzero(dense)
      mat = CooMatrix(rows=r.astype(np.int32), cols=c.astype(np.int32),
                      vals=dense[r, c], shape=dense.shape)
  np.savez("${meta.id}.coo.npz", rows=mat.rows, cols=mat.cols,
           vals=mat.vals, shape=np.asarray(mat.shape),
           row_names=np.asarray(genes or [], dtype=object),
           col_names=np.asarray(cells or [], dtype=object))
  PYEOF
  cat <<-END_VERSIONS > versions.yml
    "${task.process}":
        cogaps_tpu: \$(python -c 'import cogaps_tpu; print(cogaps_tpu.__version__)')
  END_VERSIONS
  """
}
