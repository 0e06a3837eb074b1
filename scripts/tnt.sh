# Tanks-and-Temples suite: train + tetra mesh + F1 (reference scripts/tnt.sh)
dataset_folder=${TNT_DATA:-/data/tnt_official}
for scene in Barn Caterpillar Ignatius Meetingroom Truck Courthouse; do
    python train.py -s ${dataset_folder}/${scene} -m output/tnt/${scene} -r 2 --use_decoupled_appearance 3
    python mesh_extract_tetrahedra.py -m output/tnt/${scene}
    python eval_tnt/run.py --dataset-dir ${dataset_folder}/${scene} \
        --traj-path ${dataset_folder}/${scene}/${scene}_COLMAP_SfM.log \
        --ply-path output/tnt/${scene}/recon_post.ply --out-dir output/tnt/${scene}/mesh
done
