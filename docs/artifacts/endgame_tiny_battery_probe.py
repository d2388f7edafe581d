import jax; jax.config.update('jax_platforms','cpu'); jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp, numpy as np, sys
sys.path.insert(0,'/root/repo')
from tcgan_tpu.data.datasets import generate_fake_truth
from tcgan_tpu.models import generator as gen_lib, wgan as wgan_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig
from tcgan_tpu.models.moments import data_moments
GEN = GeneratorConfig(ssn=SSNConfig(N=8,k=0.01,n=2.0,dt=0.0005,max_iter=8000,atol=1e-6),
  bandwidths=(0.25,0.5,1.0),contrasts=(20.0,),sample_sites=1,solver="ift",dtype=jnp.float64)
TRUE_J=((0.30,0.27),(0.30,0.21)); TRUE_D=((0.05,0.04),(0.05,0.04)); TRUE_S=((0.25,0.1),(0.25,0.1))
data=jnp.asarray(generate_fake_truth(GEN,TRUE_J,TRUE_D,TRUE_S,num_samples=512,batch=128,seed=1))
true_params=gen_lib.init_params(GEN,TRUE_J,TRUE_D,TRUE_S)
start={"J":true_params["J"]+0.3,"D":true_params["D"],"S":true_params["S"]}
def j_err(p):
    J,_,_=gen_lib.param_values_np(GEN,p); return float(np.abs(J-np.asarray(TRUE_J)).mean())
def run(sw, lr):
    kw=dict(gen=GEN,critic_layers=(32,32),batch_size=64,n_critic=2,n_critic0=10,
      lr_critic=1e-3,clip_grad=1.0,rate_cost=0.0,seed=0,moment_anchor=5e-2,moment_ema=0.9,lr_gen=lr)
    if sw: kw.update(gen_lr_floor=1e-8,gen_lr_switch_step=sw)
    cfg=wgan_lib.WGANConfig(**kw)
    st=wgan_lib.init_state(cfg,gen_init=jax.tree.map(jnp.copy,start),data_moments=data_moments(data))
    key=jax.random.PRNGKey(0); errs=[]
    for step in range(300):
        key,kd,ks=jax.random.split(key,3)
        nc=cfg.n_critic0 if step==0 else cfg.n_critic
        idx=jax.random.randint(kd,(nc,cfg.critic_batch),0,data.shape[0])
        st,m=wgan_lib.train_step(cfg,nc,st,data[idx],ks)
        if step%20==0 or step>=280: errs.append((step,round(j_err(st.gen_params),4)))
    return errs
print("start err", j_err(start))
for lr in (5e-3, 1e-3):
    for sw in (0, 100):
        errs=run(sw,lr)
        tail=[e for s,e in errs if s>=200]
        print(f"lr={lr} sw={sw}: tail_mean={np.mean(tail):.4f} traj={errs}")
